package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of an `array<float>` column with a CONSTANT double vector
  * (LSH hyperplane projections). The literal-chain form (64 multiply-adds
  * per plane × planes) blows past Janino's method-size limits and silently
  * falls back to interpreted evaluation; this expression references the
  * weights as a compiled-in array and loops, preserving the same
  * left-to-right IEEE accumulation as the oracle's literal SQL chain.
  */
case class DotProductConst(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), weights.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * weights(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $wRef.length);
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * $wRef[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // weights identity shouldn't break equality/canonicalization
  override def equals(o: Any): Boolean = o match {
    case DotProductConst(c, w) => c == child && java.util.Arrays.equals(w, weights)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(weights)
}

object DotProductConst {
  def apply(v: Column, weights: Array[Double]): Column =
    ColumnBridge.column(DotProductConst(ColumnBridge.expression(v), weights))
}
