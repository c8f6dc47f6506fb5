package graft.bus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kinesis bindings of the Source trait — the second production transport
  * the reference declares as a `Type` constant
  * (/root/reference/frizzle.go:28-35; like Kafka, the real connector lives
  * out-of-repo there, README.md:43-45).
  *
  * Mapping: partitionKey → Msg.id, record data → Msg.data,
  * approximateArrivalTimestamp → Msg.ts — the Kinesis record fields the
  * pinned connector exposes. `maxFetchRecordsPerShard` is the
  * admission-control knob (the reference's BUFFER_SIZE,
  * basic/source.go:13-17), applied per-shard because Kinesis meters reads
  * per shard. Requires a Kinesis connector on the classpath at runtime;
  * this build environment has no stream endpoint, so the binding is
  * config-checked in the offline suite and exercised in production
  * deployments — same contract as [[KafkaAdapters]].
  */
object KinesisAdapters {

  /** The PINNED connector contract this binding targets: the open
    * qubole/kinesis-sql connector lineage (`spark-sql-kinesis`, DataSource
    * short name `kinesis`). Its REAL option keys, per that lineage's
    * KinesisSourceProvider/README:
    *
    *   - `streamName` — the stream to read
    *   - `endpointUrl` — REQUIRED; the region is derived from the endpoint
    *     (there is no `region` key in this lineage)
    *   - `startingposition` — latest / trim_horizon / earliest (documented
    *     lowercase; Spark option maps are case-insensitive)
    *   - `kinesis.executor.maxFetchRecordsPerShard` — per-shard fetch cap
    *     (the executor knobs carry the `kinesis.executor.` prefix)
    *
    * and whose record schema exposes `partitionKey` / `data` /
    * `approximateArrivalTimestamp`. Deployments must ship a fork of that
    * lineage built for their Spark/Scala version (e.g. a
    * `spark-sql-kinesis_2.13` artifact).
    *
    * CAUTION on a wrong-lineage connector: Spark data sources silently
    * IGNORE unrecognized options, so a connector with different option
    * keys would come up with defaults (wrong endpoint, default fetch
    * caps) rather than failing at option resolution. Only the column
    * SELECT below fails loudly, and only if the record schema differs.
    * A connector from a different lineage therefore needs its own
    * BusSource binding — do not point this one at it.
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
      * contract is offline-testable as data (the suite asserts this map
      * against the pinned lineage's documented keys, not just "fails
      * mentioning kinesis").
      *
      * Emitted key → the kinesis-sql lineage constant it mirrors
      * (KinesisSourceProvider option names; drift in EITHER column is a
      * contract break the offline suite must catch):
      *
      * | emitted key | lineage constant | meaning |
      * |---|---|---|
      * | `streamName` | STREAM_NAME_KEY | stream to read |
      * | `endpointUrl` | END_POINT_URL | REQUIRED; region derives from it |
      * | `startingposition` | STARTING_POSITION_KEY | latest / trim_horizon / earliest |
      * | `kinesis.executor.maxFetchRecordsPerShard` | MAX_FETCH_RECORDS_PER_SHARD_KEY | per-shard fetch cap |
      *
      * `endpointUrl` is always present because the pinned lineage requires
      * it: when not given explicitly, it is the standard AWS regional
      * endpoint for `region`, with the partition suffix derived from the
      * region prefix (`cn-*` regions live in the `.amazonaws.com.cn`
      * partition). Other non-standard partitions (GovCloud endpoints
      * follow the standard suffix; ISO partitions do not) must pass
      * `endpointUrl` explicitly.
      */
    def connectorOptions: Map[String, String] = Map(
      "streamName" -> streamName,
      "endpointUrl" -> endpointUrl.getOrElse {
        val suffix =
          if (region.startsWith("cn-")) "amazonaws.com.cn" else "amazonaws.com"
        s"https://kinesis.$region.$suffix"
      },
      "startingposition" -> startingPosition,
      "kinesis.executor.maxFetchRecordsPerShard" -> maxFetchRecordsPerShard.toString)

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
