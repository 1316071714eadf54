package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** One subspace's ADC LOOKUP TABLE for a quantized query vector
  * (`array<long>`) against a CONSTANT codeword table: slot c holds
  * qq[offset+1 .. offset+dsub] ⋅ cw(c) as the left fold in ascending
  * dimension order seeded at 0.0 — `(0.0 + qq[i]·cw[1]) + qq[i+1]·cw[2]
  * …`, the exact IEEE op sequence of the oracle's per-subspace qscore
  * chain (`(0.0 + CAST(qq[..] AS DOUBLE) * recon[..]) + …`).
  *
  * Replaces a literal-folded `array(…)` column of ksub × dsub
  * `element_at·cast·multiply·lit` nodes: the VALUES were identical, but
  * at m=8 subspaces × ksub=16 × dsub=8 the expression TREE was ~4k nodes
  * per plan, and Catalyst re-analyzed it on every plan build (three
  * plans per serve call, once per bench run) — measured as ~4 s of pure
  * DRIVER time per serve query at sf0.1. This node is O(1) in tree size
  * with the table compiled in as a `double[][]`, the NearestClusterConst
  * pattern.
  *
  * Gap slots (cluster ids with no trained codeword) carry an all-zero
  * row, so their fold is exactly 0.0 — matching the literal column's
  * `lit(0.0)` arm; no code ever references a gap slot (codes were
  * assigned by argmin over existing book entries). A null vector yields
  * a null table (never reached: quantize runs on gated, non-null
  * vectors).
  */
case class AdcLut(child: Expression, offset: Int, cw: Array[Array[Double]])
    extends UnaryExpression {

  require(cw.nonEmpty && offset >= 0,
    s"AdcLut: ${cw.length} codewords at offset $offset (need >= 1, >= 0)")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // can yield null on a too-short vector even under a non-null child, so
  // never inherit child.nullable (a false `nullable` lets consumers elide
  // the isNull check codegen sets on that path)
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val x = v.asInstanceOf[ArrayData]
      val dsub = cw(0).length
      if (x.numElements() < offset + dsub) null
      else {
        val out = new Array[Double](cw.length)
        var c = 0
        while (c < cw.length) {
          val w = cw(c)
          var acc = 0.0
          var i = 0
          while (i < w.length) {
            acc += x.getLong(offset + i).toDouble * w(i)
            i += 1
          }
          out(c) = acc
          c += 1
        }
        new GenericArrayData(out)
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cw", cw, "double[][]")
    val childGen = child.genCode(ctx)
    val (out, c, w, acc, i) = (ctx.freshName("out"), ctx.freshName("c"),
      ctx.freshName("w"), ctx.freshName("acc"), ctx.freshName("i"))
    val dsub = cw(0).length
    val compute =
      s"""
         |if (${childGen.value}.numElements() < $offset + $dsub) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $out = new double[$cRef.length];
         |  for (int $c = 0; $c < $cRef.length; $c++) {
         |    double[] $w = $cRef[$c];
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $w.length; $i++) {
         |      $acc += (double) ${childGen.value}.getLong($offset + $i) * $w[$i];
         |    }
         |    $out[$c] = $acc;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    val guarded =
      if (child.nullable)
        s"if (${childGen.isNull}) { ${ev.isNull} = true; } else {$compute}"
      else compute
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = false;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      $guarded
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // constant-table identity shouldn't break equality/canonicalization
  override def equals(o: Any): Boolean = o match {
    case AdcLut(ch, oo, oc) => ch == child && oo == offset &&
      oc.length == cw.length && oc.indices.forall(j =>
        java.util.Arrays.equals(oc(j), cw(j)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * (31 * child.hashCode() + offset) + cw.length
}

object AdcLut {
  def apply(qq: Column, offset: Int, cw: Array[Array[Double]]): Column =
    ColumnBridge.column(AdcLut(ColumnBridge.expression(qq), offset, cw))
}
