package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Exact intersection size of two `array<struct<k:long, s:string>>` columns
  * that are BOTH sorted ascending by (k, s) and duplicate-free — one linear
  * merge instead of `array_intersect`'s per-call hash-set build.
  *
  * This is the hot inner loop of the dedup verify joins (SURVEY.md §2.10,
  * Dedup.verifyPairs): millions of candidate pairs × ~50-element shingle
  * arrays. `ArrayIntersect` allocates and hashes every element of one side
  * per pair; the merge does ~|a|+|b| primitive long compares, falling back
  * to a binary string compare only on key ties — with xxhash64 keys a tie
  * is almost always true equality, and the string check keeps the count
  * EXACT under hash collisions (colliding-but-different strings order by s,
  * the same tiebreak `sort_array` applied, so the merge stays aligned).
  *
  * Both eval and the generated code implement the identical loop, so
  * interpreted fallback (e.g. inside a join condition) gives the same
  * result.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    while (i < na && j < nb) {
      val ra = x.getStruct(i, 2)
      val rb = y.getStruct(j, 2)
      val ka = ra.getLong(0)
      val kb = rb.getLong(0)
      if (ka < kb) i += 1
      else if (ka > kb) j += 1
      else {
        val c = ra.getUTF8String(1).compareTo(rb.getUTF8String(1))
        if (c == 0) { cnt += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val cnt = ctx.freshName("cnt")
      val ra = ctx.freshName("ra")
      val rb = ctx.freshName("rb")
      val ka = ctx.freshName("ka")
      val kb = ctx.freshName("kb")
      val c = ctx.freshName("c")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $cnt = 0;
         |while ($i < $na && $j < $nb) {
         |  org.apache.spark.sql.catalyst.InternalRow $ra = $a.getStruct($i, 2);
         |  org.apache.spark.sql.catalyst.InternalRow $rb = $b.getStruct($j, 2);
         |  long $ka = $ra.getLong(0);
         |  long $kb = $rb.getLong(0);
         |  if ($ka < $kb) { $i++; }
         |  else if ($ka > $kb) { $j++; }
         |  else {
         |    int $c = $ra.getUTF8String(1).compareTo($rb.getUTF8String(1));
         |    if ($c == 0) { $cnt++; $i++; $j++; }
         |    else if ($c < 0) { $i++; }
         |    else { $j++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
