package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitter summary as a typed Spark [[Aggregator]]
  * (mergeable frequency sketch, Misra & Gries 1982; mergeability per
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * State is a counter map capped at `k` entries — O(k) PER PARTITION
  * regardless of input size, which is the whole point at 100 TB: the
  * partial-aggregate (map-side combine) runs the sketch locally and only
  * k (token, count) entries per group ever cross the shuffle, versus the
  * full token dictionary for an exact group-by-token count.
  *
  * Guarantees (capacity k, group total n):
  *   - every item with true count > n/(k+1) is PRESENT in the summary
  *     (merging partials preserves this — decrements are bounded by
  *     n/(k+1) cumulatively);
  *   - each kept estimate undercounts by at most n/(k+1).
  *
  * The summary alone is therefore a CANDIDATE set, not an answer: callers
  * that need exact output (q_heavy_hitters) re-count just the ≤ k
  * candidates exactly in a second, pruned pass — the standard
  * sketch-then-verify shape. Estimates depend on partition layout; the
  * superset guarantee does not.
  *
  * An [[Aggregator]] + `udaf`, not a Catalyst codegen expression: custom
  * aggregation state (a capped map) has no codegen'd aggregate surface in
  * public API; ObjectHashAggregate runs typed Aggregators with partial
  * merge, which preserves the map-side-combine scale shape — the win here
  * is the shuffle shape, not per-row codegen.
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(k > 0, s"MisraGries capacity must be positive, got $k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long],
      tok: String): mutable.Map[String, Long] = {
    if (tok == null) return b // null tokens carry no frequency mass
    b.get(tok) match {
      case Some(c) => b.update(tok, c + 1)
      case None if b.size < k => b.update(tok, 1L)
      case None =>
        // classic MG step: a full summary + unseen item decrements ALL
        // counters by 1 (the new item's single count cancels too); zeros
        // vacate their slots. O(k) worst case, amortized O(1) per item.
        val dead = mutable.ArrayBuffer.empty[String]
        b.keysIterator.foreach { key =>
          val c = b(key) - 1
          if (c == 0L) dead += key else b.update(key, c)
        }
        dead.foreach(b.remove)
    }
    b
  }

  override def merge(b1: mutable.Map[String, Long],
      b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b2.foreach { case (tok, c) => b1.update(tok, b1.getOrElse(tok, 0L) + c) }
    if (b1.size > k) {
      // shrink back to ≤ k: subtract the (k+1)-th largest count from every
      // counter and keep the strictly-positive residuals (≤ k of them by
      // construction). This is the PODS'12 mergeable-summaries step; the
      // cumulative decrement stays ≤ n/(k+1).
      val cut = b1.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.keysIterator.foreach { key =>
        val c = b1(key) - cut
        if (c <= 0L) dead += key else b1.update(key, c)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def finish(b: mutable.Map[String, Long]): Map[String, Long] =
    b.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    ExpressionEncoder[mutable.Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Column form: `mgSketch(k)(col)` → MapType(string, long) of ≤ k
    * candidate heavy hitters with MG estimates.
    */
  def mgSketch(k: Int): Column => Column = {
    val f = udaf(new MisraGries(k), Encoders.STRING)
    (c: Column) => f(c)
  }
}
