package graft.bus

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka bindings of the Source/Sink traits — the production transports the
  * reference declares as `Type` constants (/root/reference/frizzle.go:28-35;
  * real connectors live out-of-repo there too, README.md:43-45).
  *
  * Mapping: Kafka key → Msg.id, value → Msg.data, record timestamp →
  * Msg.ts. `maxOffsetsPerTrigger` is the admission-control knob; offset
  * commit happens at the micro-batch checkpoint (epoch Ack). Requires the
  * spark-sql-kafka connector on the classpath at runtime; this build
  * environment has no broker, so these bindings are exercised in
  * production deployments, not in the offline test suite.
  */
object KafkaAdapters {

  final class KafkaSource(
      bootstrapServers: String,
      topic: String,
      maxOffsetsPerTrigger: Long = 10000L,
      startingOffsets: String = "latest") extends BusSource {
    def stream(spark: SparkSession): DataFrame =
      spark.readStream
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
        .load()
        .select(
          col("key").cast("string").as("id"),
          col("value").as("data"),
          col("timestamp").as("ts"))
  }

  /** Config-driven construction: BUFFER_SIZE → maxOffsetsPerTrigger (the
    * reference's per-trigger record budget, basic/source.go:13-17).
    */
  def source(bootstrapServers: String, topic: String, cfg: BusConfig): KafkaSource =
    new KafkaSource(bootstrapServers, topic,
      maxOffsetsPerTrigger = cfg.bufferSize.toLong)

  /** Writes each routed batch to the destination topic (dest = topic). */
  final class KafkaSink(bootstrapServers: String) extends BusSink {
    def write(batch: Dataset[Msg], dest: String, batchId: Long): Unit =
      batch.toDF()
        .select(col("id").cast("binary").as("key"), col("data").as("value"))
        .write
        .format("kafka")
        .option("kafka.bootstrap.servers", bootstrapServers)
        .option("topic", dest)
        .save()
  }
}
