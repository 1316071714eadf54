package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** DSIR document score in exact MICRO-units (1e-6) for an `array<string>`
  * token column against a COMPILED-IN dense weight table: one generated
  * call per row instead of a per-token interpreted expression chain.
  *
  * Semantics are bit-identical to the declarative fold it replaces
  * (`aggregate(tokens, 0, (acc, t) -> acc + coalesce(element_at(wmap,
  * pmod(md5Hash32(t), buckets)), 0))` over DECIMAL(·,6) weights):
  *  - the hash is the engine-portable md5Hash32 — the first 8 hex nibbles
  *    of md5 as an unsigned 32-bit value, computed here directly from the
  *    first 4 digest bytes (big-endian), which is the same number the
  *    hex-substring/conv chain parses;
  *  - each 6dp-decimal weight is carried as a long count of micro-units,
  *    so the per-doc sum is exact integer arithmetic (|w| ≤ ~20e6 micros,
  *    doc lengths ≤ millions — no overflow within 2^63);
  *  - a bucket absent from the trained map scores 0 (the dense table's
  *    default — the fold's coalesce), a null token element scores 0 (the
  *    fold's null-propagated coalesce), and a NULL array yields NULL
  *    (the fold over a null input).
  * The caller converts micros to the display double with `micro / 1e6`:
  * micros < 2^53 are exact in double and the one division is correctly
  * rounded — the same double the DECIMAL(38,6) sum casts to.
  *
  * Why not `doGenCode` the md5 loop inline: the per-token work IS the MD5,
  * so the generated code is one static call (keeping the stage compiled —
  * no whole-stage fallback) into [[DsirScoreConst.score]], which reuses a
  * ThreadLocal digest instead of allocating one per token like the
  * interpreted Md5 expression chain does.
  */
case class DsirScoreConst(child: Expression, wMicro: Array[Long], buckets: Int)
    extends UnaryExpression {

  require(buckets > 0 && wMicro.length == buckets,
    s"DsirScoreConst: table of ${wMicro.length} for $buckets buckets")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else DsirScoreConst.score(v.asInstanceOf[ArrayData], wMicro, buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("wMicro", wMicro, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.DsirScoreConst.score($c, $wRef, $buckets)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  // constant-table identity shouldn't break equality/canonicalization
  override def equals(o: Any): Boolean = o match {
    case DsirScoreConst(ch, ow, ob) => ch == child && ob == buckets &&
      java.util.Arrays.equals(ow, wMicro)
    case _ => false
  }
  override def hashCode(): Int = 31 * child.hashCode() + buckets
}

object DsirScoreConst {

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Exact micro-unit score of one token array — called from generated
    * code, one digest reuse per thread.
    */
  def score(arr: ArrayData, w: Array[Long], buckets: Int): Long = {
    val m = md.get()
    var sum = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        m.reset()
        val d = m.digest(arr.getUTF8String(i).getBytes)
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        sum += w((h % buckets).toInt)
      }
      i += 1
    }
    sum
  }

  def apply(tokens: Column, wMicro: Array[Long], buckets: Int): Column =
    ColumnBridge.column(
      DsirScoreConst(ColumnBridge.expression(tokens), wMicro, buckets))
}
