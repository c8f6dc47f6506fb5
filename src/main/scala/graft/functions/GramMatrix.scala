package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Second-moment (Gram) aggregate over `array<float>` embeddings: one
  * distributed pass accumulates Σx, Σxxᵀ and n into a fixed
  * (dim² + dim + 1)-double buffer (dim=64 → 33 KB), merged elementwise —
  * so covariance/PCA statistics at 100 TB cost ONE map-side-combined
  * aggregation whose exchange carries a single 33 KB row per partition,
  * never the vectors. The driver then closes tiny dim×dim problems
  * (covariance, top eigenvector by power iteration) in microseconds —
  * the classic "big data, small model state" split.
  *
  * Only the upper triangle is accumulated per row (dim(dim+1)/2 FMAs);
  * [[GramStats.fromRaw]] mirrors it on the driver.
  */
class GramMatrix(dim: Int)
    extends Aggregator[Array[Float], Array[Double], Array[Double]] {

  private val gramLen = dim * dim

  override def zero: Array[Double] = new Array[Double](gramLen + dim + 1)

  override def reduce(buf: Array[Double], x: Array[Float]): Array[Double] = {
    require(x.length == dim, s"expected dim $dim, got ${x.length}")
    var i = 0
    while (i < dim) {
      val xi = x(i).toDouble
      buf(gramLen + i) += xi
      var j = i
      while (j < dim) { buf(i * dim + j) += xi * x(j); j += 1 }
      i += 1
    }
    buf(gramLen + dim) += 1.0
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Double]): Array[Double] = buf

  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

object GramMatrix {
  /** Column form: `gram(dim)(embeddingCol)` → array<double> raw buffer. */
  def gram(dim: Int): Column => Column = {
    val f = udaf(new GramMatrix(dim), ExpressionEncoder[Array[Float]]())
    (v: Column) => f(v)
  }
}

/** Driver-side view of a finished [[GramMatrix]] buffer: mean, covariance
  * and the top principal component.
  */
final case class GramStats(dim: Int, raw: Array[Double]) {
  val n: Double = raw(dim * dim + dim)
  val mean: Array[Double] = Array.tabulate(dim)(i => raw(dim * dim + i) / n)

  /** Covariance C = G/n − μμᵀ, lower triangle mirrored from the
    * accumulated upper. */
  val cov: Array[Array[Double]] = {
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = raw(i * dim + j) / n - mean(i) * mean(j)
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    c
  }

  /** Top eigenvector by power iteration (deterministic: fixed start, fixed
    * iteration count, sign fixed so the largest-|coordinate| entry is
    * positive — first index wins ties). dim×dim is driver-trivial: 300
    * iterations × dim² FMAs ≈ 1.2 M flops; convergence error is
    * (λ₂/λ₁)^iters — ~1e-12 even at a 0.91 eigengap ratio. */
  def topEigenvector(iters: Int = 300): (Array[Double], Double) = {
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(dim) { i =>
        var s = 0.0; var j = 0
        while (j < dim) { s += cov(i)(j) * v(j); j += 1 }
        s
      }
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = if (nrm > 0) w.map(_ / nrm) else v
      it += 1
    }
    var best = 0
    var i = 1
    while (i < dim) { if (math.abs(v(i)) > math.abs(v(best))) best = i; i += 1 }
    if (v(best) < 0) v = v.map(-_)
    val lambda = {
      var s = 0.0; var i2 = 0
      while (i2 < dim) {
        var j = 0
        while (j < dim) { s += v(i2) * cov(i2)(j) * v(j); j += 1 }
        i2 += 1
      }
      s
    }
    (v, lambda)
  }
}
