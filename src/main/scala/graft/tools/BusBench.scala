package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.bus._

/** Bus throughput benchmark: RateSource at a configured rate through the
  * full routing path (processor + per-dest routing + stats) into a NoopSink
  * for a fixed duration; prints one JSON line with sustained msg/s.
  *
  * Run: sbt "runMain graft.tools.BusBench [rowsPerSec] [seconds]"
  */
object BusBench {
  def main(args: Array[String]): Unit = {
    val rate = args.headOption.map(_.toInt).getOrElse(200000)
    val secs = args.lift(1).map(_.toInt).getOrElse(30)
    val triggerMs = args.lift(2).map(_.toLong).getOrElse(0L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bus = new FrizzleStream(spark, new RateSource(rate),
      FrizzleStream.exprProcessor(
        dest = when(col("id").cast("long") % 10 =!= 0, "main"),
        failed = col("id").cast("long") % 10 === 0),
      new NoopSink, failSink = Some(new NoopSink),
      checkpointDir = Some(
        java.nio.file.Files.createTempDirectory("busbench").toString),
      triggerIntervalMs = triggerMs)
      .start()
    val t0 = System.nanoTime()
    Thread.sleep(secs * 1000L)
    val liveRcv = bus.stats.rcv.get
    val liveElapsed = (System.nanoTime() - t0) / 1e9
    bus.flushAndClose(60000)
    val totalElapsed = (System.nanoTime() - t0) / 1e9
    val s = bus.stats.snapshot
    println(s"""{"metric":"bus_throughput","sustained_per_sec":${(liveRcv / liveElapsed).round},""" +
      s""""incl_drain_per_sec":${(s("rcv") / totalElapsed).round},""" +
      s""""offered_per_sec":$rate,"trigger_ms":$triggerMs,"seconds":$totalElapsed,""" +
      s""""rcv":${s("rcv")},"send":${s("send")},"ack":${s("ack")},"fail":${s("fail")}}""")
    spark.stop()
  }
}
