package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit difference hash (dHash) of an uncompressed 24bpp BMP payload —
  * the perceptual fingerprint image dedup blocks on (Krawetz's dHash; the
  * standard pre-embedding near-dup signal for image training corpora).
  *
  * Construction, all exact integer arithmetic so a DuckDB hex replay
  * (`graft.queries.MediaSql.bmpDHashCtes`) reproduces it bit for bit:
  *
  *  1. decode gate: `graft.operators.Multimodal.decodeBmp24`'s exact
  *     bounds (BITMAPINFOHEADER+, uncompressed 24bpp, complete pixel
  *     array) — anything else hashes to null, the quarantine discipline;
  *  2. sample a 9-wide x 8-tall grid by the same floor mapping the
  *     nearest-neighbor resampler uses: grid (gx, gy) reads source pixel
  *     (gx*w DIV 9, gy*h DIV 8) honoring bottom-up/top-down rows and the
  *     4-byte stride — POINT sampling, so a k* nearest upscale of an image
  *     samples the identical source pixels (floor(floor(k*x/9)/k) =
  *     floor(x/9)) and hashes EQUAL: cross-resolution dups collapse free;
  *  3. integer luma 299R + 587G + 114B per grid point (no division — only
  *     comparisons consume it, so scaling by 1000 changes nothing);
  *  4. bit (gy*8 + gx) = luma(gx, gy) > luma(gx+1, gy), the horizontal
  *     gradient sign — invariant to global brightness/contrast shifts,
  *     which is what makes it perceptual rather than cryptographic.
  *
  * The 64 bits are carried as TWO non-negative 32-bit halves (hi = bits
  * 0..31 MSB-first, lo = bits 32..63) so every downstream XOR/band shift
  * stays inside BIGINT range in both engines with no sign-bit cases.
  *
  * Scale: a pure narrow codegen'd scalar — one static call per row inside
  * whole-stage codegen, no UDF boundary, no shuffle; the natural input to
  * `Dedup.hammingPairs64`'s banded near-dup join.
  */
object DHashKernel {

  private val GridW = 9
  private val GridH = 8

  /** InternalRow(hi Long, lo Long), or null when the payload is not a
    * complete uncompressed 24bpp BMP — the codegen-callable static form.
    */
  def computeRow(b: Array[Byte]): InternalRow =
    graft.operators.Multimodal.decodeBmp24(b) match {
      case None => null
      case Some((w, h, topDown, off)) =>
        val stride = (w * 3 + 3) / 4 * 4
        val luma = new Array[Long](GridW * GridH)
        var gy = 0
        while (gy < GridH) {
          val sy = ((gy.toLong * h) / GridH).toInt
          val fileRow = if (topDown) sy else h - 1 - sy
          val rowBase = off + fileRow * stride
          var gx = 0
          while (gx < GridW) {
            val sx = ((gx.toLong * w) / GridW).toInt
            val p = rowBase + sx * 3
            // BMP pixel order is B, G, R
            luma(gy * GridW + gx) = 114L * (b(p) & 0xff) +
              587L * (b(p + 1) & 0xff) + 299L * (b(p + 2) & 0xff)
            gx += 1
          }
          gy += 1
        }
        var hi = 0L
        var lo = 0L
        var idx = 0
        while (idx < 64) {
          val gxx = idx % (GridW - 1)
          val gyy = idx / (GridW - 1)
          if (luma(gyy * GridW + gxx) > luma(gyy * GridW + gxx + 1)) {
            if (idx < 32) hi |= 1L << (31 - idx)
            else lo |= 1L << (63 - idx)
          }
          idx += 1
        }
        val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
        r.setLong(0, hi)
        r.setLong(1, lo)
        r
    }
}

object DHashBmp {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(bin: Column): Column =
    ColumnBridge.column(DHashBmp(ColumnBridge.expression(bin)))
}

/** `DHashBmp(binary)` ⇒ struct(hi long, lo long) — null for payloads that
  * are not a complete uncompressed 24bpp BMP. Whole-stage-codegen'd via a
  * static call, like the `ImageDims` family.
  */
case class DHashBmp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("hi", LongType),
    StructField("lo", LongType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    DHashKernel.computeRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val r = ctx.freshName("dhash")
      s"""
         |InternalRow $r = graft.plans.DHashKernel.computeRow($bytes);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
