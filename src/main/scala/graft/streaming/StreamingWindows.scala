package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming-mode window aggregations over a stream of (id, data, ts) bus
  * messages or any timestamped stream — the streaming counterpart of the
  * batch q_tumbling/sliding/session_window queries (graft.ops.TimeWindows;
  * the same window expressions run in both modes by construction).
  *
  * Watermarking is the piece the reference bus never had (its only late
  * notion is "fail whatever didn't drain", /root/reference/frizzle.go:
  * 162-176): `withWatermark` bounds aggregation state — at 100 TB/day the
  * state store holds only windows newer than (max event time − delay),
  * and rows later than the watermark are dropped, deterministically.
  *
  * All three return append-mode-capable streaming DataFrames: results emit
  * once per finalized window, which is what a downstream sink wants
  * (no in-place updates to re-merge).
  */
object StreamingWindows {

  /** Per-window count+sum, tumbling windows of `width`. */
  def tumbling(stream: DataFrame, tsCol: String, width: String,
      lateness: String): DataFrame =
    tumblingOf(stream.withWatermark(tsCol, lateness), tsCol, width)

  /** Tumbling aggregation over an ALREADY-watermarked stream — for
    * composition below another stateful operator (streaming dedup, a
    * stream-stream join): Spark forbids redefining the watermark, so the
    * upstream op owns it and this stage inherits.
    */
  def tumblingOf(stream: DataFrame, tsCol: String, width: String): DataFrame =
    stream
      .groupBy(window(col(tsCol), width).as("w"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
        col("cnt"), col("sum_value"))

  /** Sliding windows `width` every `slide`, keyed. */
  def sliding(stream: DataFrame, tsCol: String, keyCol: String, width: String,
      slide: String, lateness: String): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), width, slide).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("win_start"), col(keyCol), col("cnt"))

  /** Per-key session windows with an inactivity `gap`. */
  def session(stream: DataFrame, tsCol: String, keyCol: String, gap: String,
      lateness: String): DataFrame =
    stream
      .withWatermark(tsCol, lateness)
      .groupBy(session_window(col(tsCol), gap).as("w"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col(keyCol), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("cnt"))
}
