package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Bloom-filter membership test: true iff EVERY position in the
  * `array<long>` child has its bit set in the compiled-in bitset — the
  * "maybe present" answer for one probed element whose k hash positions
  * the caller computed with engine-portable arithmetic (Bloom.positions).
  *
  * A native expression because the bit test needs a variable shift
  * (`1L << (p & 63)`), which the built-in `shiftleft` only exposes for a
  * literal shift amount; packing the test into codegen also keeps the
  * whole probe inside the scan's WholeStageCodegen span. The bitset rides
  * along as a compiled-in long[] (m bits = m/8 bytes — KBs for any sane
  * filter), the single-JVM analog of broadcasting it.
  */
case class BloomTestAll(child: Expression, bits: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var i = 0
    while (i < x.numElements()) {
      val p = x.getLong(i)
      if ((bits((p >> 6).toInt) & (1L << (p & 63).toInt)) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bRef = ctx.addReferenceObj("bits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      s"""
         |${ev.value} = true;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $p = $a.getLong($i);
         |  if (($bRef[(int) ($p >> 6)] & (1L << (int) ($p & 63))) == 0L) {
         |    ${ev.value} = false;
         |    break;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // bits identity shouldn't break equality/canonicalization
  override def equals(o: Any): Boolean = o match {
    case BloomTestAll(c, b) => c == child && java.util.Arrays.equals(b, bits)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bits)
}

object BloomTestAll {
  def apply(positions: Column, bits: Array[Long]): Column =
    ColumnBridge.column(BloomTestAll(ColumnBridge.expression(positions), bits))
}
