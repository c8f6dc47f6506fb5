package graft.bus

/** Typed bus configuration — the analog of the reference's Viper-env
  * config surface (README.md:175-183: BUFFER_SIZE, MOCK, …;
  * basic/source.go:34-49). Explicit case class instead of stringly env
  * lookups; `fromEnv` maps the reference's documented variables.
  */
final case class BusConfig(
    bufferSize: Int = 500, // admission per trigger (reference default 500)
    failDest: String = "failed", // dead-letter destination name
    flushTimeoutMs: Long = 30000L, // graceful-drain budget (reference 30 s)
    mock: Boolean = false, // MOCK=true → no-op sink (A19)
    checkpointDir: Option[String] = None,
    rateLogIntervalMs: Long = 30000L) // A13 rate-report cadence (reference ReportInterval)

object BusConfig {
  /** Read the reference-documented environment variables. */
  def fromEnv(env: Map[String, String] = sys.env): BusConfig =
    BusConfig(
      bufferSize = env.get("BUFFER_SIZE").map(_.toInt).getOrElse(500),
      failDest = env.getOrElse("FAIL_DEST", "failed"),
      flushTimeoutMs = env.get("FLUSH_TIMEOUT_MS").map(_.toLong).getOrElse(30000L),
      mock = env.get("MOCK").exists(_.equalsIgnoreCase("true")),
      checkpointDir = env.get("CHECKPOINT_DIR"),
      rateLogIntervalMs =
        env.get("RATE_LOG_INTERVAL_MS").map(_.toLong).getOrElse(30000L))
}
