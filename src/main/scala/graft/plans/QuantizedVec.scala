package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Int8 scalar quantization of an `array<float>` embedding into a BINARY
  * column: byte i = clip(floor(x_i * 127 + 0.5), -127, 127).
  *
  * Why binary, why int8 (the 100 TB ANN memory story): a 64-dim float32
  * embedding is 256 bytes; quantized it is 64 — a 4× cut in scan bytes,
  * cache footprint, and broadcast size for the candidate-generation stage,
  * which is exactly the stage that reads the WHOLE corpus. The exact float
  * vector is then touched only for the top-`rerank` candidates per query
  * (`Similarity.quantizedTopK`). Rounding is floor(x*127+0.5) — a fixed
  * IEEE-754 op sequence both engines reproduce bit-identically, so the
  * DuckDB oracle replays the same integers from the float column.
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val q = Math.floor(x.getFloat(i).toDouble * 127.0 + 0.5)
      out(i) = Math.max(-127.0, Math.min(127.0, q)).toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val q = ctx.freshName("q")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  double $q = java.lang.Math.floor((double) $a.getFloat($i) * 127.0 + 0.5);
         |  $out[$i] = (byte) java.lang.Math.max(-127.0, java.lang.Math.min(127.0, $q));
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeI8 {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(a: Column): Column =
    ColumnBridge.column(QuantizeI8(ColumnBridge.expression(a)))
}

/** Integer dot product over two int8-quantized BINARY vectors: one tight
  * codegen loop of byte multiplies accumulated in a long — no floating
  * point at all in the candidate-generation hot path (integer addition is
  * associative, so unlike the float dot no accumulation-order contract is
  * even needed for engine parity).
  */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x(i).toLong * y(i).toLong
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
         |int $n = java.lang.Math.min($a.length, $b.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long) $a[$i] * (long) $b[$i];
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductI8 {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProductI8(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
