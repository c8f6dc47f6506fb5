package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count–min sketch: a fixed-size (Depth × Width longs = 32 KB) mergeable
  * frequency summary. Completes the engine's sketch family — HLL++
  * (cardinality), Misra–Gries (heavy-hitter CANDIDATES, graft.functions
  * .MisraGries), Bloom (membership), MinHash/SimHash (similarity) — with
  * point FREQUENCY ESTIMATES: est(x) ≥ true(x) always (one-sided), and
  * est(x) ≤ true(x) + ε·N with probability 1 − e^−Depth per key, ε =
  * e/Width. At 100 TB this is the frequency path when exact per-key
  * counts would shuffle the full token stream: constant 32 KB state per
  * map task, merged elementwise (associative + commutative), ONE row on
  * the wire per partition; the probe side broadcasts the finished sketch
  * and reads Depth cells per candidate.
  *
  * Keys are pre-hashed OUTSIDE the aggregate to a 64-bit integer — the
  * library default is Spark's `xxhash64`; the declared q_cms_freq_est key
  * uses the portable md5-slice hash so a DuckDB oracle can re-derive the
  * same keys — and [[CountMin.idx]] / [[CountMin.idxCol]] are the
  * same exact integer arithmetic in Scala and Column form — so the
  * build side (JVM aggregate) and the probe side (codegen'd SQL over the
  * broadcast array) address identical cells. Row hashes are
  * ((a_i·(x mod P) + b_i) mod P) mod Width over the Mersenne prime
  * P = 2^31 − 1: reducing x mod P first keeps every product < 2^62 —
  * no Long overflow under ANSI for any 64-bit input.
  */
object CountMin {
  val Depth = 4
  val Width = 1024
  val P = 2147483647L // Mersenne prime 2^31 − 1
  // fixed per-row hash params: pairwise-independent family ax+b mod P
  val A: Array[Long] = Array(1103515245L, 2654435761L, 805306457L, 1597334677L)
  val B: Array[Long] = Array(12345L, 362437L, 69069L, 1013904223L)

  /** Cell column (0-based) of key-hash x in sketch row i. */
  def idx(i: Int, x: Long): Int = {
    val xm = ((x % P) + P) % P
    (((A(i) * xm + B(i)) % P) % Width).toInt
  }

  /** SQL mirror of [[idx]] — same exact integer ops over the same
    * xxhash64 key, so probe indices match build indices bit-for-bit. */
  def idxCol(i: Int, x: Column): Column =
    ((lit(A(i)) * ((x % P + P) % P) + B(i)) % P % Width).cast("int")

  /** Point estimate of key-hash column x against a sketch array column
    * (one finished sketch, typically broadcast): min over the Depth rows
    * of the addressed cells. `element_at` is 1-based. */
  def estimateCol(sketch: Column, x: Column): Column =
    least((0 until Depth).map(i =>
      element_at(sketch, idxCol(i, x) + lit(i * Width + 1))): _*)

  /** Driver-side mirror of [[estimateCol]] for tests / small probes. */
  def estimate(sketch: Array[Long], x: Long): Long =
    (0 until Depth).map(i => sketch(i * Width + idx(i, x))).min
}

/** The mergeable aggregate: input = pre-hashed key (xxhash64), buffer and
  * output = the flat Depth×Width cell array. `merge` is elementwise add
  * (associative + commutative) — partial aggregation runs map-side and
  * the exchange carries one 32 KB row per partition, never the keys.
  */
class CountMinSketch extends Aggregator[Long, Array[Long], Array[Long]] {
  import CountMin._

  override def zero: Array[Long] = new Array[Long](Depth * Width)

  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    var i = 0
    while (i < Depth) { buf(i * Width + idx(i, x)) += 1L; i += 1 }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {
  /** Column form: `cms(xxhash64(key))` → array<bigint> of Depth·Width. */
  val agg: Column => Column = {
    val f = udaf(new CountMinSketch(), ExpressionEncoder[Long]())
    (x: Column) => f(x)
  }
}
