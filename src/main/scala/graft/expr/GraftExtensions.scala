package graft.expr

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point registering the engine's native
  * expressions as SQL functions, so `SELECT vector_dot(a, b)` works in
  * plain SQL (and through the Thrift/Connect surfaces):
  *
  *   spark.sql.extensions=graft.expr.GraftExtensions
  *
  * For an already-running session (tests, notebooks) use
  * [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def vectorDotBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2, "vector_dot takes exactly 2 arguments")
    VectorDot(children.head, children(1))
  }

  private def rollingMinHashBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "rolling_min_hash takes exactly 2 arguments: (text, window)")
    val window = children(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"rolling_min_hash window must be an integer literal, got $other")
    }
    RollingMinHash(children.head, window)
  }

  private def charSquareSumBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 1, "char_square_sum takes exactly 1 argument")
    CharSquareSum(children.head)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      vectorDotBuilder),
    (FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      rollingMinHashBuilder),
    (FunctionIdentifier("char_square_sum"),
      new ExpressionInfo(classOf[CharSquareSum].getName, "char_square_sum"),
      charSquareSumBuilder))

  /** Register the functions on a live session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
