package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{asc_nulls_first, col}
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamingDrift

/** Streaming≡batch parity for the EWMA drift monitor: the stateful ring
  * realization (StreamingDrift) must reproduce the DuckDB-hash-checked
  * batch frame (q_ewma_drift) BIT-for-bit, including the IEEE doubles —
  * both sides compute the identical integer numerator/denominator and the
  * identical single divisions.
  */
class StreamingDriftSpec extends SparkSpec {

  import spark.implicits._

  test("streaming EWMA drift over the replayed fixture equals batch q_ewma_drift bit-for-bit") {
    // replay the fixture in ts order under a lateness horizon wider than
    // the data span (nothing dropped), then advance the watermark with two
    // far-future rows under an excluded sentinel type: the first moves the
    // watermark past every real day's end, the second delivers rows to the
    // stateful operator so the timeout sweep finalizes the tail (the
    // StreamingFunnel operational note).
    val fixture = graft.ops.tbl(spark, sfDir, "events")
      .select(col("ts"), col("event_type"))
      .orderBy(asc_nulls_first("ts"), asc_nulls_first("event_id"))
      .as[(Timestamp, String)].collect()

    val in = MemoryStream[(Timestamp, String)](spark)
    val out = StreamingDrift.ewmaDrift(
      in.toDF().toDF("ts", "event_type"), "ts", "event_type", "0 seconds")
    val q = out.writeStream.format("memory").queryName("replay_drift")
      .outputMode(OutputMode.Append())
      .start()
    try {
      fixture.grouped(fixture.length / 3 + 1)
        .foreach { g => in.addData(g.toSeq); q.processAllAvailable() }
      val maxMs = fixture.map(_._1.getTime).max
      in.addData((new Timestamp(maxMs + 5L * 86400 * 1000), "zz_sentinel"))
      q.processAllAvailable()
      in.addData((new Timestamp(maxMs + 6L * 86400 * 1000), "zz_sentinel"))
      q.processAllAvailable()

      val streaming = spark.table("replay_drift")
        .filter(col("event_type") =!= "zz_sentinel")
        .select(col("event_type"), col("day").cast("string"), col("cnt"),
          col("ewma"), col("drift"))
        .as[(String, String, Long, Option[Double], Option[Double])]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      val batch = query("q_ewma_drift")
        .select(col("event_type"), col("day").cast("string"), col("cnt"),
          col("ewma"), col("drift"))
        .as[(String, String, Long, Option[Double], Option[Double])]
        .collect().sortBy(r => (r._1, r._2)).toSeq
      assert(streaming.length == batch.length,
        s"row counts differ: streaming=${streaming.length} batch=${batch.length}")
      assert(streaming == batch,
        "streaming EWMA drift must equal the batch frame bit-for-bit")
    } finally q.stop()
  }

  test("streaming EWMA drift drops a day-late row but keeps state bounded and the ring rolling") {
    // unit-grain behavior: three days for one type with 1-hour lateness;
    // after day 1 finalizes, a late row for day 1 is dropped (beyond the
    // horizon), and day 3's EWMA looks back over the finalized ring
    // exactly as the batch lag form would.
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    val in = MemoryStream[(Timestamp, String)](spark)
    val out = StreamingDrift.ewmaDrift(
      in.toDF().toDF("ts", "event_type"), "ts", "event_type", "1 hour")
    val q = out.writeStream.format("memory").queryName("drift_unit")
      .outputMode(OutputMode.Append())
      .start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), "a"), (ts("2024-01-01 11:00:00"), "a"))
      q.processAllAvailable()
      // watermark → Jan 2 02:00 ⇒ Jan 1 finalizes (cnt=2, no trailing days)
      in.addData((ts("2024-01-02 03:00:00"), "a"))
      q.processAllAvailable()
      in.addData((ts("2024-01-02 04:00:00"), "a"),
        (ts("2024-01-01 12:00:00"), "a")) // late: Jan 1 already finalized
      q.processAllAvailable()
      // watermark → Jan 3 03:00 ⇒ Jan 2 finalizes (cnt=2 — late row dropped;
      // ewma = 2·128/128 = 2.0, drift = 1.0)
      in.addData((ts("2024-01-03 04:00:00"), "a"))
      q.processAllAvailable()
      in.addData((ts("2024-01-04 06:00:00"), "a"))
      q.processAllAvailable()
      // Jan 3 finalizes: cnt=1, trailing ring = [Jan 1 (2), Jan 2 (2)] ⇒
      // ewma = (2·128 + 2·64)/(128+64) = 2.0, drift = 1/2.0
      in.addData((ts("2024-01-04 07:00:00"), "a"))
      q.processAllAvailable()
      val rows = spark.table("drift_unit")
        .select(col("day").cast("string"), col("cnt"), col("ewma"), col("drift"))
        .as[(String, Long, Option[Double], Option[Double])]
        .collect().sortBy(_._1).toSeq
      assert(rows == Seq(
        ("2024-01-01 00:00:00", 2L, None, None),
        ("2024-01-02 00:00:00", 2L, Some(2.0), Some(1.0)),
        ("2024-01-03 00:00:00", 1L, Some(2.0), Some(0.5))),
        s"unexpected drift rows: $rows")
    } finally q.stop()
  }
}
