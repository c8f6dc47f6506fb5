package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{asc_nulls_first, col}
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingAttribution

/** Streaming last-touch attribution must equal the batch query
  * (q_event_attribution) on the same fixture — the buffer-until-the-
  * watermark-passes-the-purchase design is what makes that hold under
  * both in-order and shuffled arrival.
  */
class StreamingAttributionSpec extends SparkSpec {

  import spark.implicits._

  private def fixtureOrdered: Array[(Timestamp, Long, String, Long)] =
    graft.ops.tbl(spark, sfDir, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("event_id"))
      .orderBy(asc_nulls_first("ts"), asc_nulls_first("event_id"))
      .as[(Timestamp, Long, String, Long)].collect()

  private def batchRollup: Map[String, Long] =
    query("q_event_attribution").as[(String, Long)].collect().toMap

  private def runReplay(name: String,
      fixture: Array[(Timestamp, Long, String, Long)],
      lateness: String, sentinelGapMs: Long): Map[String, Long] = {
    val in = MemoryStream[(Timestamp, Long, String, Long)](spark)
    val out = StreamingAttribution.lastTouch(
      in.toDF().toDF("ts", "user_id", "event_type", "event_id"),
      "ts", "user_id", "event_type", "event_id", lateness)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .start()
    try {
      fixture.grouped(fixture.length / 3 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      // two sentinel events under excluded user -1: the first advances the
      // watermark past every purchase + lateness, the second triggers the
      // timeout sweep (a sweep runs only when a batch delivers rows to the
      // stateful operator — same pattern as the funnel/session specs)
      val maxMs = fixture.map(_._1.getTime).max
      in.addData((new Timestamp(maxMs + sentinelGapMs), -1L, "view", -1L))
      q.processAllAvailable()
      in.addData((new Timestamp(maxMs + sentinelGapMs + 86400000L), -1L, "view", -2L))
      q.processAllAvailable()
      spark.table(name)
        .filter(col("user_id") >= 0)
        .groupBy("touch").count()
        .as[(String, Long)].collect().toMap
    } finally q.stop()
  }

  test("in-order replay of the events fixture equals batch q_event_attribution") {
    val streaming = runReplay("attr_ordered", fixtureOrdered,
      lateness = "0 seconds", sentinelGapMs = 5L * 86400000L)
    assert(streaming == batchRollup,
      s"streaming=$streaming batch=$batchRollup")
  }

  test("shuffled replay under a wide lateness equals batch (arrival-order independence)") {
    // deterministically shuffled (multiplicative hash of event_id —
    // reproducible, uncorrelated with ts); lateness wider than the span so
    // nothing drops and a purchase's touch routinely arrives AFTER it
    val shuffled = fixtureOrdered
      .sortBy { case (_, _, _, eid) => (eid % 1000003L) * 2654435761L % 4294967296L }
    val streaming = runReplay("attr_shuffled", shuffled,
      lateness = "3650 days", sentinelGapMs = (3650L + 5L) * 86400000L)
    assert(streaming == batchRollup,
      s"streaming=$streaming batch=$batchRollup")
  }

  test("a purchase does not finalize until the watermark passes it; touches prune") {
    // hand-built scenario at second granularity, lateness 0: purchase at
    // 10:00:30 must not emit while the watermark sits at 10:00:30 (a tied
    // or earlier touch could still arrive), then finalizes with the click
    // at 10:00:10 once the watermark moves past
    val in = MemoryStream[(Timestamp, Long, String, Long)](spark)
    val out = StreamingAttribution.lastTouch(
      in.toDF().toDF("ts", "user_id", "event_type", "event_id"),
      "ts", "user_id", "event_type", "event_id", "0 seconds",
      lookbackUs = 60L * 1000000L)
    val q = out.writeStream.format("memory").queryName("attr_hand")
      .outputMode(OutputMode.Append())
      .start()
    try {
      def t(s: String) = Timestamp.valueOf(s)
      in.addData((t("2024-01-01 10:00:10"), 7L, "click", 1L),
        (t("2024-01-01 10:00:30"), 7L, "purchase", 2L))
      q.processAllAvailable()
      assert(spark.table("attr_hand").isEmpty,
        "purchase must stay pending while the watermark has not passed it")
      in.addData((t("2024-01-01 10:00:31"), -1L, "view", 3L))
      q.processAllAvailable()
      in.addData((t("2024-01-01 10:00:32"), -1L, "view", 4L))
      q.processAllAvailable()
      val rows = spark.table("attr_hand").filter(col("user_id") >= 0)
        .select("purchase_id", "touch").as[(Long, String)].collect().toSeq
      assert(rows == Seq((2L, "click")))
      // a second purchase beyond the lookback of any touch → 'none'
      in.addData((t("2024-01-01 10:05:00"), 7L, "purchase", 5L))
      q.processAllAvailable()
      in.addData((t("2024-01-01 10:05:01"), -1L, "view", 6L))
      q.processAllAvailable()
      in.addData((t("2024-01-01 10:05:02"), -1L, "view", 7L))
      q.processAllAvailable()
      val all = spark.table("attr_hand").filter(col("user_id") >= 0)
        .select("purchase_id", "touch").as[(Long, String)].collect().toSet
      assert(all == Set((2L, "click"), (5L, "none")))
    } finally q.stop()
  }
}
