package graft.expr

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sum of squared per-byte-value occurrence counts of a string — the exact
  * integer numerator of the Simpson/Gini character-diversity index
  * (diversity = 1 − Σc² / n²). A per-row register loop over a reused
  * 256-slot table: O(n) per row, zero allocation after the first row,
  * exact 64-bit integer output so the downstream diversity division is
  * the query's single (correctly rounded, engine-exact) IEEE step.
  *
  * Byte semantics: counts are over UTF-8 BYTES, which equals characters on
  * ASCII corpora (the fixture); documented so multi-byte inputs are not a
  * surprise. The HOF alternative (explode one row per char + two-level
  * groupBy) shuffles |text| rows per document — this stays inside one
  * whole-stage-codegen span and shuffles nothing.
  */
case class CharSquareSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_square_sum requires a string input, got $t")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "char_square_sum"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val counts = new Array[Long](256)
    var i = 0
    while (i < n) { counts(s.getByte(i) & 0xff) += 1L; i += 1 }
    var acc = 0L
    i = 0
    while (i < 256) { val c = counts(i); acc += c * c; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // One 256-slot table per operator instance, zeroed per row — cheaper
    // than a fresh allocation per row and safe: codegen'd eval is
    // single-threaded within a partition.
    val table = ctx.addMutableState("long[]", "charSqCounts",
      v => s"$v = new long[256];")
    nullSafeCodeGen(ctx, ev, s => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      s"""
         |java.util.Arrays.fill($table, 0L);
         |int $n = $s.numBytes();
         |for (int $i = 0; $i < $n; $i++) {
         |  $table[$s.getByte($i) & 0xff] += 1L;
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < 256; $i++) {
         |  long $c = $table[$i];
         |  $acc += $c * $c;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CharSquareSum =
    copy(child = newChild)
}

object CharSquareSum {
  def apply(text: Column): Column =
    GraftBridge.column(CharSquareSum(GraftBridge.expression(text)))
}
