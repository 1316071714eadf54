package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<float>` columns, accumulating in
  * doubles left-to-right — a single codegen'd expression replacing the
  * 64-node unrolled `element_at` chain (graft.functions.VectorFns.dot).
  *
  * Why a custom Expression (SURVEY.md §2.10): the unrolled chain is
  * semantically right but each `element_at` re-checks bounds/null and the
  * tree is huge, which is catastrophic when the expression lands in a
  * broadcast-nested-loop join *condition* (evaluated per candidate pair,
  * outside whole-stage codegen). This expression compiles to one tight loop
  * (`acc += (double)a[i] * (double)b[i]`), keeping the identical IEEE-754
  * accumulation order, so results stay bit-equal to the unrolled form and to
  * the DuckDB oracle's left-associated SQL chain.
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductFloat {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  /** Column-API surface (Spark 4 bridges Column ↔ Expression via shim). */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductFloat(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
