package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point (SURVEY.md §2.10/§4): registers graft's
  * custom Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT dot_f32(a, b)")` plans the native codegen'd expression.
  *
  * Use at session build time:
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  * or on an existing session via `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      FunctionIdentifier("dot_f32"),
      new ExpressionInfo(classOf[DotProductFloat].getName, "dot_f32"),
      GraftExtensions.buildDot))
}

object GraftExtensions {
  private[plans] val buildDot: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      s"dot_f32 expects exactly 2 array<float> arguments, got ${exprs.length}")
    DotProductFloat(exprs.head, exprs(1))
  }

  /** Idempotent registration on an already-built session (tests, REPLs). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f32", buildDot, "built-in")
}
