package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingAttrition

/** Streaming≡batch parity for the per-day pipeline-attrition census: the
  * watermark-finalized raw → quality_gate → exact_dedup funnel must equal
  * the batch stage counts computed with the q_pipeline_attrition
  * arithmetic at day grain, under in-order AND shuffled replay (counter +
  * set folds finalized at the watermark are arrival-order independent by
  * construction; emit-per-batch would not be).
  */
class StreamingAttritionSpec extends SparkSpec {

  import spark.implicits._

  private val DayMs = 86400000L

  /** documents carries no event time — deterministic ingest day from the
    * id (7-day cycle starting at day 1; day-0 times would sit AT the
    * initial watermark and be dropped as late), the StreamingDupRatioSpec
    * convention: both engines derive the SAME day.
    */
  private def fixture(): Array[(Timestamp, String)] =
    graft.ops.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect()
      .map { case (id, text) => (new Timestamp((id % 7 + 1) * DayMs), text) }

  /** Batch twin: per day, COUNT(*), COUNT(gate passes), COUNT(DISTINCT
    * gated hash) — the three funnel stages' n_docs, from which drops and
    * pct-of-raw derive exactly as in q_pipeline_attrition.
    */
  private def batchFunnel(): Map[(String, Long), (Long, Long, Double)] = {
    val nTokens = size(split(col("text"), " "))
    graft.ops.tbl(spark, sfDir, "documents")
      .select(to_timestamp((col("doc_id") % 7 + 1) * lit(86400)).as("day"),
        nTokens.between(20, 80).as("gated"), xxhash64(col("text")).as("h"))
      .groupBy("day")
      .agg(count(lit(1)).as("raw"),
        count(when(col("gated"), 1)).as("gated"),
        count_distinct(when(col("gated"), col("h"))).as("uniq"))
      // cast day via the COLUMN (same rendering as the streaming side's
      // cast — Timestamp.toString appends ".0" and breaks key equality)
      .select(col("day").cast("string"), col("raw"), col("gated"), col("uniq"))
      .as[(String, Long, Long, Long)].collect()
      .flatMap { case (day, raw, gated, uniq) =>
        Seq(
          (day, 0L) -> ((raw, 0L, 1.0)),
          (day, 1L) -> ((gated, raw - gated, gated.toDouble / raw)),
          (day, 2L) -> ((uniq, gated - uniq, uniq.toDouble / raw)))
      }.toMap
  }

  private def run(fx: Array[(Timestamp, String)],
      name: String): Map[(String, Long), (Long, Long, Double)] = {
    val in = MemoryStream[(Timestamp, String)](spark)
    val out = StreamingAttrition.attritionByDay(
      in.toDF().toDF("ts", "text"), "ts", "text", "3650 days")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .start()
    try {
      fx.grouped(fx.length / 3 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      val maxMs = fx.map(_._1.getTime).max
      // two far-future sentinels advance the watermark past every open
      // day and fire the timeout sweep (their own late-born day is
      // filtered out of the comparison)
      in.addData((new Timestamp(maxMs + 3653L * DayMs), "x"))
      q.processAllAvailable()
      in.addData((new Timestamp(maxMs + 3654L * DayMs), "y"))
      q.processAllAvailable()
      spark.table(name)
        .filter(col("day") <= new Timestamp(maxMs))
        .select(col("day").cast("string"), col("stage_ord"), col("n_docs"),
          col("dropped"), col("pct_of_raw"))
        .as[(String, Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    } finally q.stop()
  }

  test("streaming attrition funnel equals the batch per-day stage counts") {
    val got = run(fixture(), "attrition_inorder")
    val want = batchFunnel()
    assert(got == want,
      s"in-order replay funnel differs: ${got.size} vs ${want.size} rows")
  }

  test("streaming attrition funnel is arrival-order independent (shuffled replay)") {
    val fx = fixture().sortBy { case (_, text) =>
      text.hashCode.toLong * 2654435761L % 4294967296L
    }
    val got = run(fx, "attrition_shuffled")
    val want = batchFunnel()
    assert(got == want,
      s"shuffled replay funnel differs: ${got.size} vs ${want.size} rows")
  }
}
