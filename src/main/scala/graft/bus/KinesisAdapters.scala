package graft.bus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kinesis bindings of the Source trait — the second production transport
  * the reference declares as a `Type` constant
  * (/root/reference/frizzle.go:28-35; like Kafka, the real connector lives
  * out-of-repo there, README.md:43-45).
  *
  * Mapping: partitionKey → Msg.id, record data → Msg.data,
  * approximateArrivalTimestamp → Msg.ts — the Kinesis record fields every
  * open connector exposes (spark-sql-kinesis / kinesis-sql lineage;
  * `format("kinesis")`). `maxFetchRecordsPerShard` is the admission-control
  * knob (the reference's BUFFER_SIZE, basic/source.go:13-17), applied
  * per-shard because Kinesis meters reads per shard. Requires a Kinesis
  * connector on the classpath at runtime; this build environment has no
  * stream endpoint, so the binding is config-checked in the offline suite
  * and exercised in production deployments — same contract as
  * [[KafkaAdapters]].
  */
object KinesisAdapters {

  /** The PINNED connector contract this binding targets: the open
    * qubole/kinesis-sql connector lineage (`spark-sql-kinesis`, DataSource
    * short name `kinesis`), whose option keys are `streamName` / `region` /
    * `startingPosition` / `maxFetchRecordsPerShard` / `endpointUrl` and
    * whose record schema exposes `partitionKey` / `data` /
    * `approximateArrivalTimestamp`. Deployments must ship a fork of that
    * lineage built for their Spark/Scala version (e.g. a
    * `spark-sql-kinesis_2.13` artifact); a connector from a DIFFERENT
    * lineage (different option keys or record schema) needs its own
    * BusSource binding — this one would fail loudly at option/column
    * resolution, never silently misread.
    */
  val connectorFormat: String = "kinesis"
  val connectorLineage: String = "qubole/kinesis-sql (spark-sql-kinesis)"

  final class KinesisSource(
      streamName: String,
      region: String,
      maxFetchRecordsPerShard: Long = 10000L,
      startingPosition: String = "latest",
      endpointUrl: Option[String] = None) extends BusSource {

    /** The exact option map handed to the pinned connector — exposed so the
      * contract is offline-testable as data (the suite asserts this map,
      * not just "fails mentioning kinesis").
      */
    def connectorOptions: Map[String, String] = Map(
      "streamName" -> streamName,
      "region" -> region,
      "startingPosition" -> startingPosition,
      "maxFetchRecordsPerShard" -> maxFetchRecordsPerShard.toString) ++
      endpointUrl.map("endpointUrl" -> _)

    def stream(spark: SparkSession): DataFrame =
      spark.readStream
        .format(connectorFormat)
        .options(connectorOptions)
        .load()
        .select(
          col("partitionKey").cast("string").as("id"),
          col("data").as("data"),
          col("approximateArrivalTimestamp").as("ts"))
  }

  /** Config-driven construction: BUFFER_SIZE → maxFetchRecordsPerShard (the
    * reference's per-trigger record budget, basic/source.go:13-17).
    */
  def source(streamName: String, region: String, cfg: BusConfig): KinesisSource =
    new KinesisSource(streamName, region,
      maxFetchRecordsPerShard = cfg.bufferSize.toLong)
}
