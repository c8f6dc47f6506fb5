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
  * the current epoch's files. A long-running bus would periodically
  * compact old epochs into one (same layout, fewer files) — the read path
  * is unchanged by compaction.
  */
final class SeenHashIndex(spark: SparkSession, dir: String) {

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

  /** The bus epoch stage over (id, data, ts) message frames: drop messages
    * whose payload hash is already in the index, keep the first copy per
    * hash WITHIN the epoch (min id), then append the survivors' hashes as
    * this epoch's partition. Wire as
    * `epochProcess = Some((df, e) => route(idx.dedupEpoch(df, e)))`.
    */
  def dedupEpoch(batch: DataFrame, epochId: Long): DataFrame = {
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
