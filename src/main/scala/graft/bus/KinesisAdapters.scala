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

  final class KinesisSource(
      streamName: String,
      region: String,
      maxFetchRecordsPerShard: Long = 10000L,
      startingPosition: String = "latest",
      endpointUrl: Option[String] = None) extends BusSource {
    def stream(spark: SparkSession): DataFrame = {
      var r = spark.readStream
        .format("kinesis")
        .option("streamName", streamName)
        .option("region", region)
        .option("startingPosition", startingPosition)
        .option("maxFetchRecordsPerShard", maxFetchRecordsPerShard)
      endpointUrl.foreach(u => r = r.option("endpointUrl", u))
      r.load()
        .select(
          col("partitionKey").cast("string").as("id"),
          col("data").as("data"),
          col("approximateArrivalTimestamp").as("ts"))
    }
  }

  /** Config-driven construction: BUFFER_SIZE → maxFetchRecordsPerShard (the
    * reference's per-trigger record budget, basic/source.go:13-17).
    */
  def source(streamName: String, region: String, cfg: BusConfig): KinesisSource =
    new KinesisSource(streamName, region,
      maxFetchRecordsPerShard = cfg.bufferSize.toLong)
}
