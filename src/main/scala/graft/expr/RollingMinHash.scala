package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin-Karp rolling-hash document fingerprint: the minimum polynomial
  * hash over every `window`-byte substring of the input, computed in one
  * O(n) pass (classic winnowing/fingerprinting primitive). Arithmetic is
  * wrapping 64-bit (deterministic on every platform — no modulus needed
  * for fingerprint use). Inputs shorter than the window hash as a whole.
  *
  * Native expression with codegen: the HOF equivalent would materialize a
  * substring per position and re-hash each from scratch — O(n·w) with n
  * allocations; this is a register-only loop.
  */
case class RollingMinHash(child: Expression, window: Int)
    extends UnaryExpression {

  require(window > 0, "window must be positive")

  private val Base = 1000003L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hash requires a string input, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_min_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val w = math.min(window, math.max(n, 1))
    // B^(w-1), wrapping
    var pow = 1L
    var k = 1
    while (k < w) { pow *= Base; k += 1 }
    var h = 0L
    var min = Long.MaxValue
    var i = 0
    while (i < n) {
      h = h * Base + (s.getByte(i) & 0xff)
      if (i >= w - 1) {
        if (h < min) min = h
        h -= (s.getByte(i - w + 1) & 0xff) * pow
      }
      i += 1
    }
    if (n == 0) 0L else if (n < w) h else min
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val w = ctx.freshName("w")
      val pow = ctx.freshName("pow")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      s"""
         |int $n = $s.numBytes();
         |int $w = java.lang.Math.min($window, java.lang.Math.max($n, 1));
         |long $pow = 1L;
         |for (int $k = 1; $k < $w; $k++) { $pow *= ${Base}L; }
         |long $h = 0L;
         |long $min = Long.MAX_VALUE;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = $h * ${Base}L + ($s.getByte($i) & 0xff);
         |  if ($i >= $w - 1) {
         |    if ($h < $min) { $min = $h; }
         |    $h -= ($s.getByte($i - $w + 1) & 0xff) * $pow;
         |  }
         |}
         |${ev.value} = ($n == 0) ? 0L : (($n < $w) ? $h : $min);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {
  def apply(text: Column, window: Int): Column =
    GraftBridge.column(RollingMinHash(GraftBridge.expression(text), window))
}
