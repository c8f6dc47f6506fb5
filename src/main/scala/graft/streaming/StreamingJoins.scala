package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream correlation primitives the reference bus has no analog
  * for (its transforms are strictly per-message): watermarked interval
  * joins and streaming deduplication.
  *
  * Scale notes: both operators are keyed — the join state store holds only
  * rows inside the watermark horizon on each side, and dedup state holds
  * one entry per key within the watermark. Without the watermark bounds,
  * stream-stream state grows without limit; with them, state size is
  * (rate × horizon) regardless of total stream length — the property that
  * makes these viable on an unbounded 100 TB/day feed.
  */
object StreamingJoins {

  /** Watermarked stream-stream equi-join with an event-time interval bound:
    * right rows join left rows of the same key when rightTs lies within
    * [leftTs − before, leftTs + after]. Both sides carry watermarks so the
    * engine can evict state once the horizon passes — the bound is what
    * lets Spark prove state finiteness for an inner stream-stream join.
    *
    * `before`/`after` are interval strings like "30 seconds".
    */
  def intervalJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lateness: String,
      before: String, after: String): DataFrame =
    left.withWatermark(leftTs, lateness)
      .join(
        right.withWatermark(rightTs, lateness),
        expr(s"""$leftKey = $rightKey
                |AND $rightTs >= $leftTs - INTERVAL $before
                |AND $rightTs <= $leftTs + INTERVAL $after""".stripMargin))

  /** Stream-static enrichment join: a streaming feed joined to a bounded
    * batch dimension (the classic "attach customer attributes to the event
    * stream"). Stateless — each micro-batch joins against the static side
    * (broadcast when small), no streaming state at all; the static side is
    * re-resolved per batch, so slowly-changing dimension files refresh
    * without restarting the query.
    */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String],
      joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)

  /** Streaming deduplication by key within the watermark horizon
    * (dropDuplicatesWithinWatermark): keeps the first arrival of each key
    * and drops re-deliveries that arrive within `lateness` of it — the
    * streaming-mode counterpart of q_dedup_exact, and the engine-level
    * version of the reference's ErrAlreadyAcked replay dedup
    * (/root/reference/common/unacked.go:33-35), with state that expires
    * instead of a map that only grows.
    */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String, lateness: String,
      keys: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
}
