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
  * Compaction (r12): a long-running bus writes one `epoch=N/` directory
  * per micro-batch — ~86k/day at a 1 s trigger, and every epoch's
  * anti-join re-lists all of them. [[compact]] merges every committed
  * partition (`epoch < uptoEpoch`) into the LOWEST one — same layout,
  * same read path, bounded directory count. With `compactEvery > 0` the
  * [[dedupEpoch]] stage self-compacts whenever the partition count
  * reaches the threshold, the bounding mechanism the reference gets from
  * acking its unacked map (/root/reference/common/unacked.go:30-38).
  *
  * @param compactEvery compact when the index holds this many epoch
  *   partitions (0 = never; the directory count then stays < compactEvery
  *   + epochs-per-compaction-interval). Safe at any value ≥ 2: epochs
  *   below the running batchId are committed by foreachBatch's sequential
  *   contract, so merging them can never race a replay (only the CURRENT
  *   epoch can replay, and it is never an input or target of compaction).
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

  /** Merge every partition with `epoch < uptoEpoch` into the lowest one —
    * identical layout (the merged set keeps that partition's epoch value,
    * which is still below every future epoch), so [[seenBefore]] is
    * unchanged; only the directory/file count drops. Idempotent: a second
    * call with the same bound is a no-op (one surviving partition).
    *
    * Safety: callers pass `uptoEpoch = the currently-running batchId`.
    * foreachBatch executes epochs sequentially, so every input partition
    * is committed — no replay can ever rewrite one. The merged frame is
    * MATERIALIZED (eager localCheckpoint) before any filesystem mutation,
    * so the overwrite of the target partition never reads from the files
    * it is replacing. Single-writer local/cluster-FS shape; an
    * object-store deployment would stage to a temp prefix and commit via
    * manifest rename instead of in-place overwrite.
    */
  def compact(uptoEpoch: Long): Unit = {
    val eps = epochs().filter(_ < uptoEpoch)
    if (eps.lengthCompare(1) <= 0) return
    val target = eps.min
    val merged = seenBefore(uptoEpoch).distinct().localCheckpoint(eager = true)
    merged.write.mode("overwrite").parquet(s"$dir/epoch=$target")
    eps.filterNot(_ == target).foreach { e =>
      deleteRecursively(Paths.get(s"$dir/epoch=$e"))
    }
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
