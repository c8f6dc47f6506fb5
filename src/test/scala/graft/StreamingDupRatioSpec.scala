package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingDupRatio

/** Streaming≡batch parity for the dedup-rate census: the watermark-
  * finalized per-(source, day) dup ratio must equal the batch
  * `COUNT(*), COUNT(DISTINCT hash) GROUP BY source, day` frame — the
  * q_dup_ratio_by_source arithmetic at day grain — under in-order AND
  * shuffled replay (a set-fold plus finalize-at-watermark is order-
  * independent by construction; emit-on-first-arrival would not be).
  */
class StreamingDupRatioSpec extends SparkSpec {

  import spark.implicits._

  private val DayMs = 86400000L

  /** The documents fixture carries no event time — assign each doc a
    * deterministic ingest day from its id (7-day cycle, starting at day 1:
    * epoch-0 event times sit exactly AT the initial watermark and Spark
    * drops them as late before the stateful operator sees them), the
    * replayable convention: both engines of the comparison derive the
    * SAME day.
    */
  private def fixture(): Array[(Timestamp, String, String)] =
    graft.ops.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
      .map { case (id, src, text) =>
        (new Timestamp((id % 7 + 1) * DayMs), src, text)
      }

  private def batchCensus(): Map[(String, String), (Long, Long, Double)] =
    graft.ops.tbl(spark, sfDir, "documents")
      .select(col("source"),
        to_timestamp((col("doc_id") % 7 + 1) * lit(86400)).as("day"),
        xxhash64(col("text")).as("h"))
      .groupBy("source", "day")
      .agg(count(lit(1)).as("n_docs"), count_distinct(col("h")).as("n_uniq"))
      .select(col("source"), col("day").cast("string"), col("n_docs"),
        col("n_uniq"),
        (lit(1.0) - col("n_uniq").cast("double") / col("n_docs").cast("double"))
          .as("dup_ratio"))
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  private def run(fx: Array[(Timestamp, String, String)],
      name: String): Map[(String, String), (Long, Long, Double)] = {
    val in = MemoryStream[(Timestamp, String, String)](spark)
    val out = StreamingDupRatio.dupRatioByDay(
      in.toDF().toDF("ts", "source", "text"), "ts", "source", "text",
      "3650 days")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .start()
    try {
      fx.grouped(fx.length / 3 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      val maxMs = fx.map(_._1.getTime).max
      // two far-future sentinels advance the watermark past every open
      // day and fire the timeout sweep (their own group is filtered out)
      in.addData((new Timestamp(maxMs + 3653L * DayMs), "-sentinel-", "x"))
      q.processAllAvailable()
      in.addData((new Timestamp(maxMs + 3654L * DayMs), "-sentinel-", "y"))
      q.processAllAvailable()
      spark.table(name)
        .filter(col("source") =!= "-sentinel-")
        .select(col("source"), col("day").cast("string"), col("n_docs"),
          col("n_uniq"), col("dup_ratio"))
        .as[(String, String, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    } finally q.stop()
  }

  test("streaming dup-ratio census equals batch per-(source, day) frame") {
    val got = run(fixture(), "dupratio_inorder")
    val want = batchCensus()
    assert(got == want,
      s"in-order replay census differs: ${got.size} vs ${want.size} groups")
  }

  test("streaming dup-ratio census is arrival-order independent (shuffled replay)") {
    val fx = fixture().sortBy { case (_, _, text) =>
      text.hashCode.toLong * 2654435761L % 4294967296L
    }
    val got = run(fx, "dupratio_shuffled")
    val want = batchCensus()
    assert(got == want,
      s"shuffled replay census differs: ${got.size} vs ${want.size} groups")
  }
}
