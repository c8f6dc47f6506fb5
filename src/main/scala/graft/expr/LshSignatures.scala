package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All `nTables` signed-random-projection LSH bucket ids of an
  * `array<float>` vector in ONE pass: bucket bit b of table t is the sign
  * of `v · plane(t*nBits + b)`, planes from
  * [[graft.functions.VectorFunctions.planeSigns]] (deterministic per
  * planeId — the same planes the DuckDB oracles render as literals).
  *
  * Why an expression and not 64 composed `hyperplaneBit` columns: the
  * composed form builds nBits×nTables separate CaseWhen+dot trees each
  * dragging its own 64-float literal — measured ~325 µs/row at sf0.1
  * (interpreted fallback + per-plane overhead), which made bucket
  * computation, not the join, the cost of the corpus-wide near-dup. This
  * compiles to one tight loop over a shared plane matrix inside
  * whole-stage codegen: copy the vector once, nPlanes×dim fused
  * multiply-adds, no allocation per plane.
  *
  * The plane matrix is derived from (nBits, nTables, dim) lazily and is
  * NOT a constructor field — expression equality stays structural on the
  * scalar params, so identical subtrees still canonicalize equal
  * (ReuseExchange on the self-join depends on it).
  *
  * Fail-loud on vectors longer than `dim` (same contract as
  * hyperplaneBit: a truncated projection is a wrong bucket, not a
  * best-effort one). Null elements count as 0.0, matching VectorDot.
  */
case class LshSignatures(child: Expression, nBits: Int, nTables: Int, dim: Int)
    extends UnaryExpression {

  require(nBits > 0 && nBits < 64 && nTables > 0, "need 0 < nBits < 64, nTables > 0")

  @transient private lazy val planesFlat: Array[Float] = {
    val nPlanes = nBits * nTables
    val out = new Array[Float](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      System.arraycopy(
        graft.functions.VectorFunctions.planeSigns(p, dim), 0, out, p * dim, dim)
      p += 1
    }
    out
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_signatures requires array<float> input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "lsh_signatures"

  /** Shared by interpreted eval and the codegen'd body via reference. */
  def compute(v: ArrayData): Array[Long] = {
    val n = v.numElements()
    if (n > dim) throw new IllegalArgumentException(
      s"lsh_signatures: vector dim $n exceeds plane dim $dim")
    val vv = new Array[Double](n)
    var i = 0
    while (i < n) {
      vv(i) = if (v.isNullAt(i)) 0.0 else v.getFloat(i).toDouble
      i += 1
    }
    val out = new Array[Long](nTables)
    val planes = planesFlat
    var p = 0
    val nPlanes = nBits * nTables
    while (p < nPlanes) {
      var acc = 0.0
      val base = p * dim
      i = 0
      while (i < n) { acc += vv(i) * planes(base + i); i += 1 }
      if (acc >= 0) out(p / nBits) |= 1L << (p % nBits)
      p += 1
    }
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    ArrayData.toArrayData(compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      // the loop body is identical either way; referencing `this` keeps the
      // generated method small and the plane matrix shared, while the math
      // still runs as one monomorphic compiled loop
      val self = ctx.addReferenceObj("lshSig", this, classOf[LshSignatures].getName)
      s"${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($self.compute($v));"
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignatures =
    copy(child = newChild)
}

object LshSignatures {
  /** Column API: array of `nTables` bucket ids for `v`. */
  def apply(v: Column, nBits: Int, nTables: Int, dim: Int = 64): Column =
    GraftBridge.column(
      LshSignatures(GraftBridge.expression(v), nBits, nTables, dim))
}
