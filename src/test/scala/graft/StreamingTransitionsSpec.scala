package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{asc_nulls_first, col}
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingTransitions

/** Streaming transition edges must equal the batch Markov matrix
  * (q_markov_transitions) on the same fixture — the
  * buffer-until-the-watermark-passes-the-pair design is what makes that
  * hold under both in-order and shuffled arrival.
  */
class StreamingTransitionsSpec extends SparkSpec {

  import spark.implicits._

  private def fixtureOrdered: Array[(Timestamp, Long, String, Long)] =
    graft.ops.tbl(spark, sfDir, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("event_id"))
      .orderBy(asc_nulls_first("ts"), asc_nulls_first("event_id"))
      .as[(Timestamp, Long, String, Long)].collect()

  private def batchCounts: Map[(String, String), Long] =
    query("q_markov_transitions")
      .select("src", "dst", "n")
      .as[(String, String, Long)].collect()
      .map { case (s, d, n) => (s, d) -> n }.toMap

  private def runReplay(name: String,
      fixture: Array[(Timestamp, Long, String, Long)],
      lateness: String, sentinelGapMs: Long): Map[(String, String), Long] = {
    val in = MemoryStream[(Timestamp, Long, String, Long)](spark)
    val out = StreamingTransitions.transitions(
      in.toDF().toDF("ts", "user_id", "event_type", "event_id"),
      "ts", "user_id", "event_type", "event_id", lateness)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .start()
    try {
      fixture.grouped(fixture.length / 3 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      // sentinel events under excluded user -1: the first advances the
      // watermark past every fixture pair + lateness, the second triggers
      // the timeout sweep (same pattern as the attribution/funnel specs)
      val maxMs = fixture.map(_._1.getTime).max
      in.addData((new Timestamp(maxMs + sentinelGapMs), -1L, "view", -1L))
      q.processAllAvailable()
      in.addData((new Timestamp(maxMs + sentinelGapMs + 86400000L), -1L, "view", -2L))
      q.processAllAvailable()
      spark.table(name)
        .filter(col("user_id") >= 0)
        .groupBy("src", "dst").count()
        .as[(String, String, Long)].collect()
        .map { case (s, d, n) => (s, d) -> n }.toMap
    } finally q.stop()
  }

  test("in-order replay of the events fixture equals batch q_markov_transitions") {
    val streaming = runReplay("trans_ordered", fixtureOrdered,
      lateness = "0 seconds", sentinelGapMs = 5L * 86400000L)
    assert(streaming == batchCounts,
      s"streaming=$streaming batch=$batchCounts")
  }

  test("shuffled replay under a wide lateness equals batch (arrival-order independence)") {
    // deterministically shuffled (multiplicative hash of event_id); the
    // wide lateness admits every out-of-order row, and finalization still
    // waits for the watermark — an eager consecutive-fold would mis-pair
    val shuffled = fixtureOrdered
      .sortBy { case (_, _, _, eid) => (eid % 1000003L) * 2654435761L % 4294967296L }
    val streaming = runReplay("trans_shuffled", shuffled,
      lateness = "3650 days", sentinelGapMs = (3650L + 5L) * 86400000L)
    assert(streaming == batchCounts,
      s"streaming=$streaming batch=$batchCounts")
  }

  test("a pair does not finalize until the watermark passes its later member") {
    // hand-built, lateness 0: (view @ :00, click @ :30) must not emit
    // while the watermark sits at :30 (an event could still land between
    // them at :30 with a lower id? no — but one at :29 could), then
    // finalizes once a later event advances the watermark past :30
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val t30 = Timestamp.valueOf("2024-01-01 10:00:30")
    val t90 = Timestamp.valueOf("2024-01-01 10:01:30")
    val in = MemoryStream[(Timestamp, Long, String, Long)](spark)
    val out = StreamingTransitions.transitions(
      in.toDF().toDF("ts", "user_id", "event_type", "event_id"),
      "ts", "user_id", "event_type", "event_id", "0 seconds")
    val q = out.writeStream.format("memory").queryName("trans_pending")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData((t0, 1L, "view", 1L), (t30, 1L, "click", 2L))
      q.processAllAvailable()
      assert(spark.table("trans_pending").count() == 0,
        "no pair may emit before the watermark passes its later member")
      // a late-but-admissible event BETWEEN them must still be honored
      in.addData((t90, 1L, "purchase", 3L))
      q.processAllAvailable()
      val rows = spark.table("trans_pending")
        .as[(Long, String, String)].collect().toSet
      assert(rows == Set((1L, "view", "click")),
        s"watermark at :90 finalizes exactly view->click, got $rows")
    } finally q.stop()
  }
}
