package graft.bus

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seen-hash index maintained ACROSS micro-batches — the streaming
  * realization of [[graft.ops.Dedup.incrementalDedup]]'s scale claim: at
  * 100 TB the seen side IS a maintained hash index (8 bytes per document),
  * never the corpus itself. Plugged into a running [[FrizzleStream]] via
  * its epoch-aware processor, it dedups every arriving epoch against
  * everything ingested before it.
  *
  * Layout: an epoch-partitioned parquet spool `dir/epoch=N/` holding one
  * column `h` (xxhash64 of the payload). Replay-safe by construction under
  * foreachBatch's at-least-once delivery:
  *   - the lookup for epoch N reads only partitions `epoch < N`, so a
  *     replayed epoch never anti-joins against its own previous (failed)
  *     attempt's hashes — no replay can silently drop its own rows;
  *   - the append for epoch N OVERWRITES `epoch=N`, so a replay converges
  *     to the same index state instead of double-appending.
  *
  * Scale shape: the anti-join is hash-partitioned on the 8-byte key (AQE
  * broadcasts the index while it is small); the index grows by FIRST
  * copies only; partition pruning keeps the `epoch < N` read from touching
  * the current epoch's files.
  *
  * Compaction (r12, tiered r13): a long-running bus writes one `epoch=N/`
  * directory per micro-batch — ~86k/day at a 1 s trigger, and every
  * epoch's anti-join re-lists all of them. [[compact]] merges runs in
  * SIZE CLASSES (LSM shape): each hash is rewritten O(log epochs) times
  * over the index's lifetime and the directory count stays
  * O(fanout · log epochs), vs the r12 single-level merge that rewrote the
  * ENTIRE index every compaction (O(N²/k) cumulative bytes on a perpetual
  * bus). With `compactEvery > 0` the [[dedupEpoch]] stage self-compacts
  * whenever the partition count reaches the threshold, the bounding
  * mechanism the reference gets from acking its unacked map
  * (/root/reference/common/unacked.go:30-38).
  *
  * @param compactEvery compact when the index holds this many epoch
  *   partitions (0 = never); also the tiering fanout (runs per size class
  *   before they merge, min 2). The directory count then stays
  *   ≤ ~compactEvery · log_compactEvery(epochs). Safe at any value ≥ 2:
  *   epochs below the running batchId are committed by foreachBatch's
  *   sequential contract, so merging them can never race a replay (only
  *   the CURRENT epoch can replay, and it is never an input of
  *   compaction; merged runs live at fresh labels, never overwriting
  *   anything).
  */
final class SeenHashIndex(spark: SparkSession, dir: String,
    compactEvery: Int = 0) {

  /** Hashes ingested before `epochId` (empty frame if no prior epoch). */
  def seenBefore(epochId: Long): DataFrame = {
    val root = Paths.get(dir)
    val hasEpochs = Files.isDirectory(root) && {
      val st = Files.list(root)
      try st.iterator().hasNext finally st.close()
    }
    if (!hasEpochs) spark.range(0).select(col("id").as("h"))
    else spark.read.parquet(dir).filter(col("epoch") < epochId).select("h")
  }

  /** Record `hashes` as epoch `epochId`'s survivors (overwrite = replay
    * idempotent).
    */
  def append(hashes: DataFrame, epochId: Long): Unit =
    hashes.toDF("h").distinct()
      .write.mode("overwrite").parquet(s"$dir/epoch=$epochId")

  /** Epoch partition values currently on disk. */
  def epochs(): Seq[Long] = {
    val root = Paths.get(dir)
    if (!Files.isDirectory(root)) Nil
    else {
      val st = Files.list(root)
      try {
        val it = st.iterator()
        val buf = Seq.newBuilder[Long]
        while (it.hasNext) {
          val name = it.next().getFileName.toString
          if (name.startsWith("epoch=")) buf += name.stripPrefix("epoch=").toLong
        }
        buf.result()
      } finally st.close()
    }
  }

  /** Cumulative bytes written by [[compact]] merges over this instance's
    * lifetime — the quantity whose growth BusSpec bounds to prove the
    * tiered scheme's write amplification is O(log epochs) per hash, not
    * O(epochs) (the single-level failure mode).
    */
  def compactBytesWritten: Long = _compactBytes.get()
  private val _compactBytes = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Test failpoint: runs after a merged run is durably staged, before its
    * input runs are deleted — the crash window BusSpec injects into to
    * prove a torn compaction never loses history.
    */
  private[graft] var onBeforeDelete: () => Unit = () => ()

  /** Tiered (LSM-style) compaction over the runs with `epoch < uptoEpoch`.
    * A "run" is one `epoch=V/` directory; raw epochs are weight-1 runs, a
    * merged run carries the sum of its inputs' weights in a `_run_weight`
    * sidecar (underscore-prefixed — invisible to parquet reads). Class of
    * a run = ⌊log_fanout(weight)⌋; whenever a class holds ≥ fanout runs
    * they merge into ONE run of the next class, cascading like a
    * base-fanout counter. Each hash is therefore rewritten at most
    * log_fanout(epochs) times over the index's lifetime and the directory
    * count stays ≤ ~fanout · log_fanout(epochs) — vs the single-level
    * all-into-one merge, whose cumulative rewrite is O(N²/k) bytes.
    * Idempotent: a repeat call with no full class is a no-op.
    *
    * Crash safety — committed history is NEVER destroyed before its
    * replacement is durable: the merged run is written to a FRESH negative
    * label (negative ⇒ below every real batchId, so [[seenBefore]]'s
    * `epoch < N` filter always includes it; fresh ⇒ nothing is overwritten
    * in place, which also makes the write object-store safe — no
    * delete-then-rewrite window). Only after that write commits are the
    * input runs deleted. A crash before the commit leaves a partial merged
    * run whose rows duplicate the still-intact inputs; a crash
    * mid-deletion leaves whole duplicate runs — both harmless to the
    * anti-join (a duplicate hash cannot re-admit a document) and
    * self-healing (leftovers are ordinary runs that a later compaction
    * folds in and `distinct()` dedups). No recovery step exists because
    * none is needed.
    *
    * Safety vs replays: callers pass `uptoEpoch = the currently-running
    * batchId`. foreachBatch executes epochs sequentially, so every input
    * run is committed — only the CURRENT epoch can replay, and it is never
    * an input of compaction.
    *
    * @return bytes written by this call (0 if no class was full)
    */
  def compact(uptoEpoch: Long): Long = {
    val fanout = math.max(2, compactEvery)
    var written = 0L
    var merged = true
    while (merged) {
      merged = false
      val runs = epochs().filter(_ < uptoEpoch).map(e => (e, weightOf(e)))
      runs.groupBy { case (_, w) => sizeClass(w, fanout) }
        .toSeq.sortBy(_._1)
        .find(_._2.sizeCompare(fanout) >= 0)
        .foreach { case (_, group) =>
          written += mergeRuns(group)
          merged = true // cascade: the new run may fill the next class
        }
    }
    _compactBytes.addAndGet(written)
    written
  }

  /** Merge one size-class group into a single run at a fresh negative
    * label; delete the inputs only after the staged write commits.
    */
  private def mergeRuns(group: Seq[(Long, Long)]): Long = {
    val label = math.min(0L, epochs().min) - 1
    val out = s"$dir/epoch=$label"
    val paths = group.map { case (e, _) => s"$dir/epoch=$e" }
    // reading the input dirs directly (no basePath) yields just the `h`
    // column; the write job consumes them while they still exist — no
    // materialization step is needed because nothing is overwritten
    spark.read.parquet(paths: _*).select("h").distinct()
      .write.mode("error").parquet(out)
    Files.writeString(Paths.get(out, "_run_weight"),
      group.map(_._2).sum.toString)
    onBeforeDelete()
    group.foreach { case (e, _) =>
      deleteRecursively(Paths.get(s"$dir/epoch=$e"))
    }
    dirBytes(Paths.get(out))
  }

  /** Epoch count a run represents (its `_run_weight` sidecar; raw = 1). */
  private def weightOf(e: Long): Long = {
    val p = Paths.get(s"$dir/epoch=$e", "_run_weight")
    if (Files.exists(p)) Files.readString(p).trim.toLong else 1L
  }

  /** ⌊log_fanout(weight)⌋ by integer division (no float edge cases). */
  private def sizeClass(w: Long, fanout: Int): Int = {
    var c = 0
    var x = w
    while (x >= fanout) { x /= fanout; c += 1 }
    c
  }

  private def dirBytes(p: java.nio.file.Path): Long = {
    if (!Files.exists(p)) return 0L
    val st = Files.walk(p)
    try {
      var total = 0L
      val it = st.iterator()
      while (it.hasNext) {
        val f = it.next()
        if (Files.isRegularFile(f)) total += Files.size(f)
      }
      total
    } finally st.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val st = Files.list(p)
      try {
        val it = st.iterator()
        while (it.hasNext) deleteRecursively(it.next())
      } finally st.close()
    }
    Files.deleteIfExists(p)
  }

  /** The bus epoch stage over (id, data, ts) message frames: drop messages
    * whose payload hash is already in the index, keep the first copy per
    * hash WITHIN the epoch (min id), then append the survivors' hashes as
    * this epoch's partition. Wire as
    * `epochProcess = Some((df, e) => route(idx.dedupEpoch(df, e)))`.
    */
  def dedupEpoch(batch: DataFrame, epochId: Long): DataFrame = {
    // self-compaction on the partition-count threshold, BEFORE the lookup:
    // the lookup then lists a bounded directory set. Compacting here (vs a
    // side thread) keeps the single-writer invariant for free.
    if (compactEvery > 0 && epochs().count(_ < epochId) >= compactEvery)
      compact(epochId)
    val w = Window.partitionBy("__h").orderBy(asc_nulls_first("id"))
    val survivors = batch.withColumn("__h", xxhash64(col("data")))
      .join(seenBefore(epochId).toDF("__h"), Seq("__h"), "left_anti")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      // materialize once: the survivor set feeds the index append AND the
      // returned frame — recomputing it after the append would anti-join
      // the epoch against itself
      .localCheckpoint(eager = true)
    append(survivors.select(col("__h").as("h")), epochId)
    survivors.drop("__h")
  }
}
