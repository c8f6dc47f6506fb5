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

  /** ±1 hyperplane for `planeId` as a LITERAL array<float>: the signs are
    * plan-time constants (seeded PRNG per plane), so the projection is one
    * codegen'd [[dot]] against a broadcast literal — the previous
    * formulation re-derived every sign with a runtime hash per element per
    * plane (dims × planes hashes + an intermediate array per row).
    * Deterministic on any cluster: the plane depends only on planeId/dim.
    */
  private[graft] def planeSigns(planeId: Int, dim: Int): Array[Float] = {
    val rnd = new scala.util.Random(0x9E3779B97F4A7C15L ^ planeId.toLong)
    Array.fill(dim)(if (rnd.nextBoolean()) 1.0f else -1.0f)
  }

  private[graft] def planeLit(planeId: Int, dim: Int): Column =
    typedLit(planeSigns(planeId, dim))

  /** The same plane as a DuckDB array literal — the signs are exact small
    * integers, so the SQL oracle computes the IDENTICAL projection (both
    * engines fold exact doubles in array order; see Similarity's LSH
    * oracles).
    */
  private[graft] def planeSql(planeId: Int, dim: Int): String =
    planeSigns(planeId, dim).map(v => if (v > 0) "1" else "-1")
      .mkString("CAST([", ",", "] AS DOUBLE[])")

  /** Sign bit of `v · plane` for one deterministic pseudo-random hyperplane
    * of dimension `dim`. The plane must COVER the vector: [[dot]] folds the
    * common prefix, so a vector longer than `dim` would silently project
    * onto its first `dim` components — fail loudly instead of bucketing on
    * a truncated projection.
    */
  def hyperplaneBit(v: Column, planeId: Int, dim: Int = 64): Column =
    when(size(v) > dim,
      raise_error(concat(lit("hyperplaneBit: vector dim "),
        size(v).cast("string"), lit(s" exceeds plane dim $dim"))))
      .otherwise(when(dot(v, planeLit(planeId, dim)) >= 0, 1L).otherwise(0L))

  /** nBits-bit signed-random-projection LSH bucket id for a vector. */
  def lshBucket(v: Column, nBits: Int, dim: Int = 64): Column =
    (0 until nBits).map(b => hyperplaneBit(v, b, dim) * (1L << b)).reduce(_ + _)
}
