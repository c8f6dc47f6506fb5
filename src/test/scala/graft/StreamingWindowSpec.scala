package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingWindows

/** Streaming window semantics: tumbling aggregation under a watermark emits
  * finalized windows in append mode and DROPS rows later than the
  * watermark — the bounded-state behavior that makes windowed aggregation
  * viable on an unbounded 100 TB/day stream.
  */
class StreamingWindowSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  final case class Ev(ts: Timestamp, value: Double)

  test("tumbling window with watermark drops late rows in append mode") {
    val in = MemoryStream[Ev](spark)
    val out = StreamingWindows.tumbling(in.toDF(), "ts", "10 minutes", "5 minutes")
    val q = out.writeStream
      .format("memory")
      .queryName("tumbling_wm")
      .outputMode(OutputMode.Append())
      .start()
    try {
      // batch 1: two rows in the 10:00 window, one in 10:10
      in.addData(Ev(ts("2024-01-01 10:02:00"), 1.0), Ev(ts("2024-01-01 10:07:00"), 2.0),
        Ev(ts("2024-01-01 10:11:00"), 4.0))
      q.processAllAvailable()
      // batch 2: advance event time far enough that watermark (max-5min)
      // passes 10:10 → the 10:00 window finalizes and emits
      in.addData(Ev(ts("2024-01-01 10:30:00"), 8.0))
      q.processAllAvailable()
      // batch 3: a LATE row for the already-finalized 10:00 window → dropped
      in.addData(Ev(ts("2024-01-01 10:03:00"), 100.0))
      q.processAllAvailable()
      // batch 4: advance watermark past everything open so 10:10 emits too
      in.addData(Ev(ts("2024-01-01 11:00:00"), 16.0))
      q.processAllAvailable()

      val rows = spark.table("tumbling_wm")
        .select($"win_start".cast("string"), $"cnt", $"sum_value")
        .as[(String, Long, Double)].collect().toMap2
      assert(rows("2024-01-01 10:00:00") == ((2L, 3.0)),
        "late row must NOT be merged into the finalized 10:00 window")
      assert(rows("2024-01-01 10:10:00") == ((1L, 4.0)))
      assert(!rows.contains("2024-01-01 11:00:00") || rows.size >= 2)
    } finally q.stop()
  }

  test("streaming session window merges within gap across batches") {
    val in = MemoryStream[(Timestamp, Long)](spark)
    val out = StreamingWindows.session(
      in.toDF().toDF("ts", "user_id"), "ts", "user_id", "30 minutes", "10 minutes")
    val q = out.writeStream
      .format("memory")
      .queryName("session_wm")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((ts("2024-01-01 09:00:00"), 1L), (ts("2024-01-01 09:10:00"), 1L))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 09:20:00"), 1L)) // still same session
      q.processAllAvailable()
      in.addData((ts("2024-01-01 12:00:00"), 1L)) // big gap → closes session
      q.processAllAvailable()
      in.addData((ts("2024-01-01 14:00:00"), 1L)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("session_wm")
        .select($"session_start".cast("string"), $"cnt")
        .as[(String, Long)].collect().toMap
      assert(rows("2024-01-01 09:00:00") == 3L,
        "three events within 30-minute gaps form ONE session")
    } finally q.stop()
  }

  test("streaming tumbling window over the replayed fixture equals the batch query") {
    // the same window expression in both execution modes must agree: replay
    // the events table as a stream (file source), aggregate per day with a
    // lateness horizon beyond the data span, compare against the batch
    // q_tumbling_window day counts.
    import org.apache.spark.sql.functions.lit
    import graft.bus.TableReplaySource
    val src = new TableReplaySource(s"$sfDir/events.parquet",
      idCol = "event_id",
      tsExpr = graft.ops.eventsTsExprSql(spark, s"$sfDir/events.parquet"))
    val stream = src.stream(spark).withColumn("value", lit(1.0))
    val out = StreamingWindows.tumbling(stream, "ts", "1 day", "3650 days")
    val q = out.writeStream.format("memory").queryName("replay_tumbling")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .start()
    try {
      q.processAllAvailable()
      val streaming = spark.table("replay_tumbling")
        .select($"win_start".cast("string"), $"cnt")
        .as[(String, Long)].collect().toMap
      val batch = query("q_tumbling_window")
        .select($"day".cast("string"), $"cnt")
        .as[(String, Long)].collect().toMap
      assert(streaming == batch,
        "streaming and batch tumbling windows must agree on the same data")
    } finally q.stop()
  }

  test("streaming session windows over the replayed fixture equal the µs-exact batch oracle frame-for-frame") {
    // q_session_window is hash-oracled against DuckDB at exact-µs
    // boundaries (r11); this replays the SAME fixture through the
    // watermarked streaming path and requires frame-for-frame equality —
    // upgrading streaming parity from rows-only to exact. Append mode only
    // emits FINALIZED sessions, so the fixture streams in ts order (no
    // late drops) followed by one far-future sentinel that pushes the
    // watermark past every real session's end; the sentinel's own session
    // never finalizes and is excluded by key.
    import org.apache.spark.sql.functions.{asc_nulls_first, col, unix_timestamp}
    val fixture = graft.ops.tbl(spark, sfDir, "events")
      .select(col("ts"), col("user_id"))
      .orderBy(asc_nulls_first("ts"))
      .as[(Timestamp, Long)].collect()
    val sentinel = (new Timestamp(fixture.map(_._1.getTime).max + 48L * 3600 * 1000), -1L)

    val in = MemoryStream[(Timestamp, Long)](spark)
    val out = StreamingWindows.session(
      in.toDF().toDF("ts", "user_id"), "ts", "user_id", "30 minutes", "0 seconds")
    val q = out.writeStream.format("memory").queryName("replay_session")
      .outputMode(OutputMode.Append())
      .start()
    try {
      fixture.grouped(fixture.length / 4 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      in.addData(sentinel)
      q.processAllAvailable()
      val streaming = spark.table("replay_session")
        .filter(col("user_id") >= 0)
        .select(col("user_id"),
          unix_timestamp(col("session_start")).as("session_start_s"),
          unix_timestamp(col("session_end")).as("session_end_s"),
          col("cnt"))
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      val batch = query("q_session_window")
        .as[(Long, Long, Long, Long)].collect().sorted.toSeq
      assert(streaming.length == batch.length,
        s"row counts differ: streaming=${streaming.length} batch=${batch.length}")
      assert(streaming == batch,
        "streaming session windows must equal the batch oracle frame-for-frame")
    } finally q.stop()
  }

  test("streaming funnel over the replayed fixture equals batch q_event_funnel frame-for-frame") {
    // q_event_funnel is hash-oracled at exact-µs stage windows; replay the
    // SAME fixture through the watermarked flatMapGroupsWithState funnel
    // and require the per-stage user counts to match exactly — extending
    // the streaming≡batch parity pattern (tumbling r3, session r12) to the
    // analytics family. Users finalize when the watermark passes their
    // conversion horizon; two far-future SIGNUP sentinels (excluded user
    // -1) advance the watermark past every horizon and then trigger the
    // timeout sweep — a sweep runs only when a batch delivers rows to the
    // stateful operator, so the sentinel must survive the stage filter
    // (same pattern as the session-window test's excluded sentinel key).
    import org.apache.spark.sql.functions.{asc_nulls_first, col}
    import graft.streaming.StreamingFunnel
    val fixture = graft.ops.tbl(spark, sfDir, "events")
      .select(col("ts"), col("user_id"), col("event_type"))
      .orderBy(asc_nulls_first("ts"), asc_nulls_first("event_id"))
      .as[(Timestamp, Long, String)].collect()

    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val out = StreamingFunnel.userStages(
      in.toDF().toDF("ts", "user_id", "event_type"),
      "ts", "user_id", "event_type",
      stages = Seq("signup", "click", "purchase"), lateness = "0 seconds")
    val q = out.writeStream.format("memory").queryName("replay_funnel")
      .outputMode(OutputMode.Append())
      .start()
    try {
      fixture.grouped(fixture.length / 3 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      val maxMs = fixture.map(_._1.getTime).max
      in.addData((new Timestamp(maxMs + 5L * 86400 * 1000), -1L, "signup"))
      q.processAllAvailable()
      in.addData((new Timestamp(maxMs + 6L * 86400 * 1000), -1L, "signup"))
      q.processAllAvailable()
      val streaming = spark.table("replay_funnel")
        .filter(col("user_id") >= 0)
        .groupBy("stage").count()
        .as[(Long, Long)].collect().toMap
      val batch = query("q_event_funnel")
        .as[(Long, Long)].collect().toMap
      assert(streaming == batch,
        s"streaming funnel stage counts must equal batch: streaming=$streaming batch=$batch")
    } finally q.stop()
  }

  test("streaming funnel is arrival-order independent: shuffled replay equals batch") {
    // the buffer-until-finalize design claim, tested head-on: replay the
    // fixture in a DETERMINISTICALLY SHUFFLED order (multiplicative-hash
    // sort of event_id — reproducible, and uncorrelated with ts) under a
    // lateness horizon wider than the whole data span, so nothing is
    // dropped and every stage event may arrive before its predecessor
    // stage. An incremental fold would mis-stage these users; the
    // at-finalization evaluation must still equal batch exactly.
    import org.apache.spark.sql.functions.col
    import graft.streaming.StreamingFunnel
    val fixture = graft.ops.tbl(spark, sfDir, "events")
      .select(col("ts"), col("user_id"), col("event_type"), col("event_id"))
      .as[(Timestamp, Long, String, Long)].collect()
      .sortBy { case (_, _, _, eid) => (eid % 1000003L) * 2654435761L % 4294967296L }
      .map(r => (r._1, r._2, r._3))

    val in = MemoryStream[(Timestamp, Long, String)](spark)
    val out = StreamingFunnel.userStages(
      in.toDF().toDF("ts", "user_id", "event_type"),
      "ts", "user_id", "event_type",
      stages = Seq("signup", "click", "purchase"), lateness = "3650 days")
    val q = out.writeStream.format("memory").queryName("replay_funnel_shuffled")
      .outputMode(OutputMode.Append())
      .start()
    try {
      fixture.grouped(fixture.length / 3 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      // sentinels must clear span + lateness for the watermark to pass
      // every user's conversion horizon, and must be STAGE-typed so the
      // timeout sweep runs (excluded sentinel user, as above)
      val maxMs = fixture.map(_._1.getTime).max
      val farMs = maxMs + (3650L + 5L) * 86400 * 1000
      in.addData((new Timestamp(farMs), -1L, "signup"))
      q.processAllAvailable()
      in.addData((new Timestamp(farMs + 86400 * 1000), -1L, "signup"))
      q.processAllAvailable()
      val streaming = spark.table("replay_funnel_shuffled")
        .filter(col("user_id") >= 0)
        .groupBy("stage").count()
        .as[(Long, Long)].collect().toMap
      val batch = query("q_event_funnel")
        .as[(Long, Long)].collect().toMap
      assert(streaming == batch,
        s"shuffled-arrival funnel must equal batch: streaming=$streaming batch=$batch")
    } finally q.stop()
  }

  test("streaming windowed drift monitor equals the batch q_stats_windows oracle frame frame-for-frame") {
    // windowedStats is ONE definition for both modes: exact DECIMAL power
    // sums are order-independent and partial-aggregatable, so the
    // replayed stream must reproduce the hash-oracled batch frame
    // BIT-FOR-BIT (same engine, same fixed IEEE tail) — including the
    // n=1 NULL-sd windows if any.
    import org.apache.spark.sql.functions.col
    val fixture = graft.ops.tbl(spark, sfDir, "events")
      .select(col("ts"), col("event_type"), col("value"))
      .as[(Timestamp, String, Double)].collect()

    val in = MemoryStream[(Timestamp, String, Double)](spark)
    val out = graft.ops.TimeWindows.windowedStats(
      in.toDF().toDF("ts", "event_type", "value")
        .withWatermark("ts", "3650 days"))
    val q = out.writeStream.format("memory").queryName("replay_stats")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      fixture.grouped(fixture.length / 3 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      val streaming = spark.table("replay_stats")
        .select(col("day").cast("string"), col("event_type"),
          col("n"), col("mean"), col("sd"))
        .as[(String, String, Long, Double, Option[Double])]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      val batch = query("q_stats_windows")
        .select(col("day").cast("string"), col("event_type"),
          col("n"), col("mean"), col("sd"))
        .as[(String, String, Long, Double, Option[Double])]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      assert(streaming.length == batch.length,
        s"row counts differ: streaming=${streaming.length} batch=${batch.length}")
      assert(streaming == batch,
        "streaming windowed stats must equal the batch oracle frame bit-for-bit")
    } finally q.stop()
  }

  implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
