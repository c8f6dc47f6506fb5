package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.bus._

/** StatsSink egress parity: the attached sink must observe exactly the
  * deltas the in-process BusStats counters record (the reference forwards
  * every counter bump to statsd; we forward to the pluggable sink).
  */
class StatsSinkSpec extends SparkSpec {

  test("InMemoryStatsSink totals equal BusStats snapshot after a bus run") {
    val mem = new InMemoryStatsSink
    val src = new MemorySource(spark)
    val sink = new MemorySink
    val dlq = new MemorySink
    val bus = new FrizzleStream(
      spark, src,
      FrizzleStream.exprProcessor(
        dest = when(col("data").cast("string") =!= "fail", "out"),
        failed = col("data").cast("string") === "fail"),
      sink, Some(dlq),
      checkpointDir = Some(Files.createTempDirectory("statsck").toString),
      statsSink = mem)
    bus.start()
    src.put(Seq("a", "b", "fail").zipWithIndex
      .map { case (s, i) => Msg.utf8(s"m$i", s) }: _*)
    bus.awaitIdle()
    val snap = bus.stats.snapshot
    bus.flushAndClose(10000)
    assert(snap("rcv") == 3 && snap("fail") == 1 && snap("ack") == 2)
    val fwd = mem.counterTotals
    snap.foreach { case (bucket, v) =>
      assert(fwd.getOrElse(bucket, 0L) == v,
        s"sink must see the same total for '$bucket': sink=$fwd stats=$snap")
    }
  }

  test("InMemoryStatsSink gaugeValues reads back the rate-monitor gauges") {
    // gaugeValues is the read API of the gauge() channel the bus rate
    // monitor feeds (FrizzleStream publishes "rate" per progress event) —
    // the counterTotals twin; last-write-wins per gauge name
    val mem = new InMemoryStatsSink
    mem.gauge("rate", 12.5)
    mem.gauge("lag", 3.0)
    mem.gauge("rate", 99.25)
    assert(mem.gaugeValues == Map("rate" -> 99.25, "lag" -> 3.0))
  }

  test("LoggingStatsSink emits statsd line protocol") {
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    val s = new LoggingStatsSink("frizzle", lines += _)
    s.increment("rcv", 500)
    s.increment("noop", 0) // zero deltas are suppressed
    s.gauge("rate", 1234.56)
    assert(lines.toSeq == Seq("frizzle.rcv:500|c", "frizzle.rate:1234.6|g"))
  }
}
