package graft.bus

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** Pluggable stats egress — the analog of the reference's statsd client
  * (/root/reference/stats.go:5-7: `stats.Increment`/`stats.Gauge` via an
  * env-configured statsd endpoint, README.md:185-199). The bus keeps its
  * in-process [[BusStats]] counters as the source of truth and FORWARDS
  * each delta here, so an exporter sees the same increments statsd would —
  * without the bus depending on any wire protocol (this image has zero
  * egress; a real deployment implements one `StatsSink` against its
  * metrics system and passes it to [[FrizzleStream]]).
  *
  * Implementations must be thread-safe: increments arrive from the
  * streaming micro-batch thread and the listener bus concurrently.
  */
trait StatsSink {
  /** Counter delta, statsd `<bucket>:<n>|c` semantics. */
  def increment(bucket: String, n: Long): Unit
  /** Gauge set, statsd `<name>:<v>|g` semantics. */
  def gauge(name: String, value: Double): Unit
  def close(): Unit = ()
}

/** Default: counters stay in-process only (BusStats.snapshot). */
object NoopStatsSink extends StatsSink {
  def increment(bucket: String, n: Long): Unit = ()
  def gauge(name: String, value: Double): Unit = ()
}

/** Emits statsd line protocol to a log function (default stderr) — the
  * zero-dependency stand-in for a UDP statsd client: the lines are exactly
  * what would go on the wire (`ctr.rcv:500|c`, `rate:1234.5|g`).
  */
final class LoggingStatsSink(
    prefix: String = "frizzle",
    out: String => Unit = System.err.println) extends StatsSink {
  def increment(bucket: String, n: Long): Unit =
    if (n != 0) out(s"$prefix.$bucket:$n|c")
  def gauge(name: String, value: Double): Unit =
    out(f"$prefix.$name:$value%.1f|g")
}

/** Accumulating sink for tests and in-process scraping: total per bucket,
  * last value per gauge.
  */
final class InMemoryStatsSink extends StatsSink {
  private val counters = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private val gauges = new ConcurrentHashMap[String, java.lang.Double]()
  def increment(bucket: String, n: Long): Unit =
    counters.computeIfAbsent(bucket, _ => new java.util.concurrent.atomic.AtomicLong())
      .addAndGet(n)
  def gauge(name: String, value: Double): Unit = gauges.put(name, value)
  def counterTotals: Map[String, Long] =
    counters.asScala.map { case (k, v) => k -> v.get }.toMap
  def gaugeValues: Map[String, Double] =
    gauges.asScala.map { case (k, v) => k -> v.doubleValue }.toMap
}
