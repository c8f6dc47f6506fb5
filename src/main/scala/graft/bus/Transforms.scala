package graft.bus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-message transform applied on the bus, with a receive direction
  * (source → app) and a send direction (app → sink) — the analog of the
  * reference's Transformer (/root/reference/transform.go:8-21). Transforms
  * are narrow column pipelines over the `data` column: they stay inside one
  * whole-stage-codegen span, never shuffle, and compose in registration
  * order.
  */
trait MsgTransform extends Serializable {
  /** Applied to each incoming message batch (columns id/data/ts). */
  def onReceive(df: DataFrame): DataFrame
  /** Applied to each outgoing message batch (columns id/data/ts). */
  def onSend(df: DataFrame): DataFrame
}

/** Identity transform. */
object NoopTransform extends MsgTransform {
  def onReceive(df: DataFrame): DataFrame = df
  def onSend(df: DataFrame): DataFrame = df
}

/** Separator framing: append `sep` to the payload on send, strip one
  * trailing `sep` (if present) on receive — byte-level semantics matching
  * the reference's separator Transformer
  * (/root/reference/transform.go:28-59), so send∘receive = identity.
  */
final class SeparatorTransform(sep: Array[Byte]) extends MsgTransform {

  private val sepLen = sep.length

  def onSend(df: DataFrame): DataFrame =
    df.withColumn("data", concat(col("data"), lit(sep)))

  def onReceive(df: DataFrame): DataFrame = {
    val n = length(col("data"))
    // endsWith on binary: compare the trailing sepLen bytes.
    val hasSep = n >= sepLen &&
      (substring(col("data"), -sepLen, sepLen) === lit(sep))
    df.withColumn("data",
      when(hasSep, substring(col("data"), lit(1), (n - sepLen).cast("int")))
        .otherwise(col("data")))
  }
}

object SeparatorTransform {
  def utf8(sep: String): SeparatorTransform =
    new SeparatorTransform(sep.getBytes(java.nio.charset.StandardCharsets.UTF_8))
}
