package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingJoins

/** Stream-stream interval join and streaming dedup semantics: matches
  * inside the event-time bound join, re-deliveries within the watermark
  * horizon are dropped.
  */
class StreamingJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  final case class Click(user: Long, click_ts: Timestamp)
  final case class Buy(buyer: Long, buy_ts: Timestamp, amount: Double)

  test("interval join matches same-key rows within the event-time bound") {
    val clicks = MemoryStream[Click](spark)
    val buys = MemoryStream[Buy](spark)
    val joined = StreamingJoins.intervalJoin(
      clicks.toDF(), buys.toDF(),
      leftKey = "user", rightKey = "buyer",
      leftTs = "click_ts", rightTs = "buy_ts",
      lateness = "1 minute", before = "0 seconds", after = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(Click(1L, ts("2024-01-01 10:00:00")),
        Click(2L, ts("2024-01-01 10:00:00")))
      buys.addData(
        Buy(1L, ts("2024-01-01 10:05:00"), 9.0), // within 10 min → match
        Buy(2L, ts("2024-01-01 10:20:00"), 7.0), // outside bound → no match
        Buy(3L, ts("2024-01-01 10:06:00"), 5.0)) // no matching click
      q.processAllAvailable()
      val rows = spark.table("ssjoin").select($"user", $"amount")
        .as[(Long, Double)].collect().toSet
      assert(rows == Set((1L, 9.0)),
        "only the same-key purchase inside [click, click+10min] joins")
    } finally q.stop()
  }

  test("composed streaming pipeline: dedup then windowed aggregation") {
    // the streaming shape of the training-data pipeline: raw feed →
    // dedup within watermark → tumbling per-window stats, one query
    val in = MemoryStream[Buy](spark)
    val deduped = StreamingJoins.dedupWithinWatermark(
      in.toDF().withColumnRenamed("buy_ts", "ts").withColumnRenamed("amount", "value"),
      "ts", "20 minutes", Seq("buyer"))
    // the dedup stage owns the watermark; the window stage inherits it
    val out = graft.streaming.StreamingWindows.tumblingOf(
      deduped, "ts", "10 minutes")
    val q = out.writeStream.format("memory").queryName("sspipe")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(
        Buy(1L, ts("2024-01-01 10:01:00"), 5.0),
        Buy(1L, ts("2024-01-01 10:02:00"), 5.0), // re-delivery: dropped
        Buy(2L, ts("2024-01-01 10:04:00"), 3.0))
      q.processAllAvailable()
      in.addData(Buy(3L, ts("2024-01-01 11:00:00"), 1.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("sspipe")
        .select($"win_start".cast("string"), $"cnt", $"sum_value")
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(rows("2024-01-01 10:00:00") == ((2L, 8.0)),
        "window must aggregate the DEDUPED stream (2 buyers, 5.0+3.0)")
    } finally q.stop()
  }

  test("stream-static enrichment joins each micro-batch to the dimension") {
    val in = MemoryStream[Click](spark)
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user", "tier")
    val out = StreamingJoins.enrich(in.toDF(), dim, Seq("user"))
    val q = out.writeStream.format("memory").queryName("ssenrich")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Click(1L, ts("2024-01-01 10:00:00")),
        Click(3L, ts("2024-01-01 10:01:00"))) // no dim row → left join null
      q.processAllAvailable()
      val rows = spark.table("ssenrich").select($"user", $"tier")
        .as[(Long, Option[String])].collect().toMap
      assert(rows == Map(1L -> Some("gold"), 3L -> None))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark drops re-delivered keys across batches") {
    val in = MemoryStream[Click](spark)
    val out = StreamingJoins.dedupWithinWatermark(
      in.toDF(), "click_ts", "10 minutes", Seq("user"))
    val q = out.writeStream.format("memory").queryName("ssdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(Click(1L, ts("2024-01-01 10:00:00")),
        Click(1L, ts("2024-01-01 10:00:30"))) // same-batch re-delivery
      q.processAllAvailable()
      in.addData(Click(1L, ts("2024-01-01 10:01:00"))) // cross-batch re-delivery
      in.addData(Click(2L, ts("2024-01-01 10:02:00"))) // distinct key passes
      q.processAllAvailable()
      val users = spark.table("ssdedup").select($"user").as[Long].collect().toSeq
      assert(users.sorted == Seq(1L, 2L),
        "each key emits exactly once within the watermark horizon")
    } finally q.stop()
  }
}
