package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Squared Euclidean distance between an `array<long>` (quantized vector)
  * column and a CONSTANT double centroid: `fold((0.0, i asc), acc + (q[i] -
  * c[i])²)`. The accumulation order and term shape are exactly the oracle's
  * parenthesis tree `(((0.0 + t1) + t2) + ...)`, and the centroid constants
  * are the engine-computed exact-int-sum / count doubles — so the result is
  * bit-identical to DuckDB replaying the same iteration (see KMeans).
  *
  * Codegen'd loop (like DotProductConst): the unrolled literal chain for
  * k × dim terms would blow Janino's method limits and fall back to
  * interpreted eval.
  */
case class QuantizedDistConst(child: Expression, cent: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  // null both for a null vector AND for one shorter than the centroid:
  // the oracle's distSqSql indexes q[i] past a short list's end and gets a
  // NULL distance, so a partial fold here would diverge from it (the NULL
  // distances then sort NULLS LAST and the row lands on the lowest cluster
  // id in BOTH engines — see KMeans.assignNearest's default arm).
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < cent.length) return null
    var acc = 0.0
    var i = 0
    while (i < cent.length) {
      val d = x.getLong(i).toDouble - cent(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cent", cent, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() < $cRef.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $cRef.length; $i++) {
         |    double $d = (double) $a.getLong($i) - $cRef[$i];
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def equals(o: Any): Boolean = o match {
    case QuantizedDistConst(c, w) => c == child && java.util.Arrays.equals(w, cent)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(cent)
}

object QuantizedDistConst {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(child: Column, cent: Array[Double]): Column =
    ColumnBridge.column(new QuantizedDistConst(ColumnBridge.expression(child), cent))
}
