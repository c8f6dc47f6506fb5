package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order functions (`zip_with`/`aggregate`/`transform`) —
  * no UDFs, so the hot path stays inside whole-stage codegen and benefits
  * from Parquet column pruning.
  *
  * Accumulation is double-precision left-fold in array order: deterministic
  * for a given row regardless of partitioning.
  */
object VectorFunctions {

  /** Dot product of two float vectors (double accumulator). Native Catalyst
    * expression with codegen (graft.expr.VectorDot) — a tight primitive
    * loop, no per-element lambda frames; bit-identical to [[dotHof]].
    */
  def dot(a: Column, b: Column): Column =
    graft.expr.VectorExpressions.vectorDot(a, b)

  /** Higher-order-function dot product (zip_with + aggregate); the
    * all-built-ins reference implementation that [[dot]] must match.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(v: Column): Column = dot(v, v)

  /** L2 norm. */
  def norm(v: Column): Column = sqrt(normSq(v))

  /** Cosine similarity; 0.0 for zero-norm inputs (never NaN/null). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Sign bit of `v · plane` for one deterministic pseudo-random hyperplane.
    * Plane components are ±1 derived from xxhash64(planeId, dimIndex) — no
    * stored plane matrix, reproducible on any cluster.
    */
  def hyperplaneBit(v: Column, planeId: Int): Column = {
    val signed = aggregate(
      zip_with(v, sequence(lit(0), size(v) - 1),
        (x, i) => when(pmod(xxhash64(lit(planeId), i), lit(2)) === 0, x).otherwise(-x)),
      lit(0.0), (acc, x) => acc + x)
    when(signed >= 0, 1L).otherwise(0L)
  }

  /** nBits-bit signed-random-projection LSH bucket id for a vector. */
  def lshBucket(v: Column, nBits: Int): Column =
    (0 until nBits).map(b => hyperplaneBit(v, b) * (1L << b)).reduce(_ + _)
}
