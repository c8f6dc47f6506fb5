package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
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

  test("decontamination works stream-side: static bench set, identical flags") {
    // The q_decontaminate shape under readStream: the benchmark shingle-hash
    // set is STATIC (bounded eval suite → broadcast), the corpus arrives as
    // a stream, and the stream-static broadcast join flags contaminated
    // docs per micro-batch with no corpus shuffle — the same plan the batch
    // operator runs. Dedup of (doc, shingle) hits is the one stateful op;
    // the per-doc rollup happens on the sink (downstream batch / update-
    // mode agg in production). Parity oracle: the batch operator itself.
    val docs = graft.ops.tbl(spark, sfDir, "documents")
      .select($"doc_id".cast("long"), $"text").as[(Long, String)].collect().toSeq
    val bench = graft.ops.Dedup.shingleHashStreamPos(docs.toDF("doc_id", "text"), 3)
      .filter($"doc_id" < 20).select("h1").distinct()
    val in = MemoryStream[(Long, String)](spark)
    val flagged = graft.ops.Dedup
      .shingleHashStreamPos(in.toDF().toDF("doc_id", "text"), 3)
      .select("doc_id", "h1")
      .filter($"doc_id" >= 20)
      .join(broadcast(bench), Seq("h1"))
      .dropDuplicates("doc_id", "h1")
    val q = flagged.writeStream.format("memory").queryName("ssdecon")
      .outputMode(OutputMode.Append()).start()
    try {
      val (first, second) = docs.splitAt(docs.size / 2)
      in.addData(first: _*)
      q.processAllAvailable()
      in.addData(second: _*) // cross-batch arrival must not change flags
      q.processAllAvailable()
      val got = spark.table("ssdecon").groupBy("doc_id")
        .agg(count(lit(1)).as("n_hits"))
        .as[(Long, Long)].collect().toMap
      val want = query("q_decontaminate").as[(Long, Long)].collect().toMap
      assert(got == want,
        s"streaming flags must equal the batch operator's (${got.size} vs ${want.size} docs)")
    } finally q.stop()
  }

  test("PII scrub runs stream-side: stateless projection, identical redaction") {
    // scrubPii/piiHits are pure codegen'd projections, so they drop into a
    // readStream pipeline unchanged — no state, no watermark, per-batch.
    val docs = Seq(
      (1L, "call 5551234 or mail a.user@host.example now"),
      (2L, "clean text with no contact at all"),
      (3L, "ids 987654321 and 1234 overlap x@y.zz"))
    val in = MemoryStream[(Long, String)](spark)
    val out = in.toDF().toDF("doc_id", "text")
      .select($"doc_id", graft.ops.TextOps.scrubPii($"text").as("scrubbed"),
        graft.ops.TextOps.piiHits($"text").as("hits"))
    val q = out.writeStream.format("memory").queryName("ssscrub")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("ssscrub")
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      val want = docs.toDF("doc_id", "text")
        .select($"doc_id", graft.ops.TextOps.scrubPii($"text").as("scrubbed"),
          graft.ops.TextOps.piiHits($"text").as("hits"))
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(got == want)
      assert(got.map(_._3) == Seq(2L, 0L, 3L), "hit counts: 2 / 0 / 3")
      assert(!got.exists(r => r._2.contains("5551234") || r._2.contains("@")),
        "no raw PII survives the stream-side scrub")
    } finally q.stop()
  }

  test("markup stripping runs stream-side: stateless projection, identical output") {
    // stripMarkup is a pure codegen'd projection like scrubPii — the
    // raw-web extraction stage drops into a readStream ingest unchanged.
    val docs = Seq(
      (1L, "<p>hello <b>world</b></p><script>var x = 9;</script>"),
      (2L, "no markup at all"),
      (3L, "<div class=\"a\">entity &amp; tail</div>"))
    val in = MemoryStream[(Long, String)](spark)
    val out = in.toDF().toDF("doc_id", "text")
      .select($"doc_id", graft.ops.TextOps.stripMarkup($"text").as("clean"))
    val q = out.writeStream.format("memory").queryName("ssstrip")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("ssstrip")
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      val want = docs.toDF("doc_id", "text")
        .select($"doc_id", graft.ops.TextOps.stripMarkup($"text").as("clean"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(got == want)
      assert(got.map(_._2) == Seq("hello world", "no markup at all", "entity tail"),
        "tags, script payloads and entities must all vanish stream-side")
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
