package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Nearest-centroid cluster id for an `array<long>` (quantized vector)
  * column against a CONSTANT centroid table: the whole k-way argmin as ONE
  * small generated loop over a compiled-in `double[][]`.
  *
  * Replaces the staged form (k QuantizedDistConst columns + a k-arm
  * when-chain): at k=16 centroids × 8 PQ subspaces the staged projection's
  * generated method exceeded Janino's 64 KB limit and the whole stage fell
  * back to interpreted eval, and the auto-k operators (k ~ n/500) grow the
  * chain without bound. Semantics are IDENTICAL to the staged fold and to
  * the oracle's `ROW_NUMBER() OVER (ORDER BY dist ASC NULLS LAST, cluster
  * ASC)` pick:
  *  - per-centroid distance = left fold in ascending dimension order of
  *    `((double) q[i] - cent[i])²` seeded at 0.0 — QuantizedDistConst's
  *    exact IEEE op sequence, which is the oracle's parenthesis tree;
  *  - a vector SHORTER than a centroid has a NULL distance to it (the
  *    oracle indexes past the list end) — skipped, like NULLS LAST;
  *  - the scan takes the FIRST strict minimum in ascending centroid order
  *    (== ties break on lowest cluster id);
  *  - a null vector, or one with no non-null distance, lands on the lowest
  *    cluster id — where the oracle's NULLS-LAST rank puts it.
  * `ids`/`cents` must be parallel and sorted ascending by cluster id.
  */
case class NearestClusterConst(child: Expression, ids: Array[Long],
    cents: Array[Array[Double]]) extends UnaryExpression {

  require(ids.length == cents.length && ids.nonEmpty,
    s"NearestClusterConst: ${ids.length} ids vs ${cents.length} centroids (need >= 1)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    var bestId = ids(0)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData]
      var best = 0.0
      var has = false
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        if (x.numElements() >= cent.length) {
          var acc = 0.0
          var i = 0
          while (i < cent.length) {
            val d = x.getLong(i).toDouble - cent(i)
            acc += d * d
            i += 1
          }
          if (!has || acc < best) { has = true; best = acc; bestId = ids(c) }
        }
        c += 1
      }
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    val cRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val childGen = child.genCode(ctx)
    val (best, has, c, cent, acc, i, d) = (ctx.freshName("best"),
      ctx.freshName("has"), ctx.freshName("c"), ctx.freshName("cent"),
      ctx.freshName("acc"), ctx.freshName("i"), ctx.freshName("d"))
    val loop =
      s"""
         |double $best = 0.0;
         |boolean $has = false;
         |for (int $c = 0; $c < $cRef.length; $c++) {
         |  double[] $cent = $cRef[$c];
         |  if (${childGen.value}.numElements() >= $cent.length) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $cent.length; $i++) {
         |      double $d = (double) ${childGen.value}.getLong($i) - $cent[$i];
         |      $acc += $d * $d;
         |    }
         |    if (!$has || $acc < $best) { $has = true; $best = $acc; ${ev.value} = $idsRef[$c]; }
         |  }
         |}
       """.stripMargin
    val guarded = if (child.nullable) s"if (!${childGen.isNull}) {$loop}" else loop
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = $idsRef[0];
      $guarded
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // constant-table identity shouldn't break equality/canonicalization
  override def equals(o: Any): Boolean = o match {
    case NearestClusterConst(ch, oi, oc) => ch == child &&
      java.util.Arrays.equals(oi, ids) &&
      oc.length == cents.length && oc.indices.forall(j =>
        java.util.Arrays.equals(oc(j), cents(j)))
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(ids)
}

object NearestClusterConst {
  def apply(v: Column, ids: Array[Long], cents: Array[Array[Double]]): Column =
    ColumnBridge.column(
      NearestClusterConst(ColumnBridge.expression(v), ids, cents))
}
