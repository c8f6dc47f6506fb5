package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{asc_nulls_first, col, date_trunc, min => fmin}
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingReach

/** Streaming≡batch parity for the reach census: the stateful first-seen
  * ledger must equal the batch per-user min-day frame even under shuffled
  * arrival (first-ARRIVAL semantics would fail that), and the
  * dedup→window DAU composition must equal the batch per-day distinct
  * counts.
  */
class StreamingReachSpec extends SparkSpec {

  import spark.implicits._

  private def fixture(): Array[(Timestamp, Long)] =
    graft.ops.tbl(spark, sfDir, "events")
      .select(col("ts"), col("user_id"))
      .orderBy(asc_nulls_first("ts"), asc_nulls_first("event_id"))
      .as[(Timestamp, Long)].collect()

  private def batchFirstSeen(): Map[Long, String] =
    graft.ops.tbl(spark, sfDir, "events")
      .groupBy(col("user_id"))
      .agg(fmin(date_trunc("day", col("ts"))).as("day"))
      .select(col("user_id"), col("day").cast("string"))
      .as[(Long, String)].collect().toMap

  test("streaming first-seen ledger equals batch min-day per user under SHUFFLED replay") {
    // multiplicative-hash shuffle of the fixture (reproducible, uncorrelated
    // with ts) under a lateness horizon wider than the span: a user's
    // earliest event may arrive LAST; the min-fold must still attribute the
    // user to the batch min day. Two far-future sentinels (excluded user -1)
    // advance the watermark and trigger the timeout sweep.
    val fx = fixture().sortBy { case (_, u) => u * 2654435761L % 4294967296L }
    val in = MemoryStream[(Timestamp, Long)](spark)
    val out = StreamingReach.firstSeen(
      in.toDF().toDF("ts", "user_id"), "ts", "user_id", "3650 days")
    val q = out.writeStream.format("memory").queryName("replay_reach")
      .outputMode(OutputMode.Append())
      .start()
    try {
      fx.grouped(fx.length / 3 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      val maxMs = fx.map(_._1.getTime).max
      in.addData((new Timestamp(maxMs + 3653L * 86400 * 1000), -1L))
      q.processAllAvailable()
      in.addData((new Timestamp(maxMs + 3654L * 86400 * 1000), -1L))
      q.processAllAvailable()
      val streaming = spark.table("replay_reach")
        .filter(col("user_id") >= 0)
        .select(col("user_id"), col("day").cast("string"))
        .as[(Long, String)].collect().toMap
      val batch = batchFirstSeen()
      assert(streaming == batch,
        s"first-seen ledgers differ: ${streaming.size} vs ${batch.size} users")
    } finally q.stop()
  }

  test("streaming DAU composition equals batch per-day distinct users") {
    val fx = fixture()
    val in = MemoryStream[(Timestamp, Long)](spark)
    val out = StreamingReach.dau(
      in.toDF().toDF("ts", "user_id"), "ts", "user_id", "3650 days")
    val q = out.writeStream.format("memory").queryName("replay_dau")
      .outputMode(OutputMode.Append())
      .start()
    try {
      fx.grouped(fx.length / 3 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      val maxMs = fx.map(_._1.getTime).max
      in.addData((new Timestamp(maxMs + 3653L * 86400 * 1000), -1L))
      q.processAllAvailable()
      val streaming = spark.table("replay_dau")
        .select(col("day").cast("string"), col("dau"))
        .as[(String, Long)].collect().toMap
      val batch = query("q_daily_reach")
        .select(col("day").cast("string"), col("dau"))
        .as[(String, Long)].collect().toMap
      // the sentinel's own far-future day never finalizes; every real day does
      assert(streaming == batch,
        s"DAU frames differ: streaming=${streaming.size} batch=${batch.size} days")
    } finally q.stop()
  }
}
