package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM FLAC STREAMINFO parsing — byte/bit arithmetic only, no audio
  * library (the lossless-audio sibling of WavHeaders). FLAC requires the
  * FIRST metadata block after the `fLaC` magic to be STREAMINFO (type 0,
  * 34 bytes), which packs sample rate (20 bits), channels-1 (3 bits),
  * bits-per-sample-1 (5 bits) and total samples (36 bits) across bytes
  * 18..25 of the header — so a valid header is decodable at fixed offsets
  * with no chunk walk. Wrong magic, a different first block type, a
  * declared block length < 34, or truncation all parse to null. The
  * identical decision procedure runs in DuckDB SQL (`MediaSql.flacMeta*`),
  * which is what makes mm07 oracle-checkable on real FLAC bytes.
  */
object FlacHeaders {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** InternalRow(format, sample_rate, channels, bits, total_samples) or
    * null — the codegen-callable form.
    */
  def parseRow(b: Array[Byte]): InternalRow = {
    val n = b.length
    if (n < 42) return null
    if (b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C') return null
    if ((u8(b, 4) & 0x7f) != 0) return null // first block must be STREAMINFO
    val blockLen = (u8(b, 5) << 16) | (u8(b, 6) << 8) | u8(b, 7)
    if (blockLen < 34) return null
    val sr = (u8(b, 18) << 12) | (u8(b, 19) << 4) | (u8(b, 20) >> 4)
    val ch = ((u8(b, 20) >> 1) & 0x7) + 1
    val bps = (((u8(b, 20) & 1) << 4) | (u8(b, 21) >> 4)) + 1
    val total = ((u8(b, 21) & 0xf).toLong << 32) |
      (u8(b, 22).toLong << 24) | (u8(b, 23) << 16) |
      (u8(b, 24) << 8) | u8(b, 25)
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
    r.update(0, UTF8String.fromString("flac"))
    r.setLong(1, sr)
    r.setInt(2, ch)
    r.setInt(3, bps)
    r.setLong(4, total)
    r
  }
}

/** `FlacMeta(binary)` ⇒ struct(format, sample_rate, channels, bits,
  * total_samples), null for non-FLAC payloads. Codegen'd via a static call
  * — one narrow pass, no UDF boundary (same §2.10 surface as AudioMeta).
  */
case class FlacMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("sample_rate", LongType),
    StructField("channels", IntegerType),
    StructField("bits", IntegerType),
    StructField("total_samples", LongType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    FlacHeaders.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val r = ctx.freshName("flac")
      s"""
         |InternalRow $r = graft.plans.FlacHeaders.parseRow($bytes);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FlacMeta {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(bin: Column): Column =
    ColumnBridge.column(FlacMeta(ColumnBridge.expression(bin)))
}
