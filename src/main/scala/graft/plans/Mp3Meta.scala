package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM MPEG-audio (MP3) frame-header parsing — byte arithmetic only,
  * no codec (the lossy-audio sibling of WavHeaders/FlacHeaders). An
  * optional ID3v2 tag (10-byte header, 28-bit SYNCSAFE size — bit 7 of
  * every size byte must be ignored) is skipped, then the first frame
  * header's four bytes decode version (MPEG1/2/2.5 from bits 4-3 of byte
  * 1), layer (I/II/III from bits 2-1), bitrate and sample rate via the
  * spec's lookup tables, and channel mode. Reserved version/layer bits,
  * "free" (0) or invalid (15) bitrate indices, the reserved sample-rate
  * index, a bad sync, or truncation all parse to null. The SAME tables
  * drive the DuckDB mirror (`MediaSql.mp3Ctes` generates its CASE chains
  * from the arrays below), so mm09 is oracle-checkable on real bytes.
  */
object Mp3Headers {

  // bitrate kbps by index 1..14 (index 0 = "free", 15 = invalid → null)
  val BitrateV1L1: Array[Int] =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  val BitrateV1L2: Array[Int] =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  val BitrateV1L3: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  val BitrateV2L1: Array[Int] =
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  val BitrateV2L23: Array[Int] =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  val SampleRateV1: Array[Int] = Array(44100, 48000, 32000)
  val SampleRateV2: Array[Int] = Array(22050, 24000, 16000)
  val SampleRateV25: Array[Int] = Array(11025, 12000, 8000)

  /** kbps table for (version bits, layer bits); layer bits 3=I, 2=II,
    * 1=III; version bits 3=MPEG1, 2=MPEG2, 0=MPEG2.5.
    */
  def bitrateTable(verBits: Int, layerBits: Int): Array[Int] =
    (verBits, layerBits) match {
      case (3, 3) => BitrateV1L1
      case (3, 2) => BitrateV1L2
      case (3, 1) => BitrateV1L3
      case (_, 3) => BitrateV2L1
      case _ => BitrateV2L23
    }

  def sampleRateTable(verBits: Int): Array[Int] = verBits match {
    case 3 => SampleRateV1
    case 2 => SampleRateV2
    case _ => SampleRateV25
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff

  /** Offset of the first frame: past a well-formed ID3v2 tag, else 0.
    * -1 when an ID3 tag is declared but its syncsafe size is unreadable.
    */
  def frameStart(b: Array[Byte]): Int = {
    val n = b.length
    if (n >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      if ((u8(b, 6) | u8(b, 7) | u8(b, 8) | u8(b, 9)) >= 0x80) -1 // not syncsafe
      else 10 + ((u8(b, 6) << 21) | (u8(b, 7) << 14) | (u8(b, 8) << 7) | u8(b, 9))
    } else 0
  }

  /** InternalRow(format, version, layer, bitrate_kbps, sample_rate,
    * channels) or null — the codegen-callable form.
    */
  def parseRow(b: Array[Byte]): InternalRow = {
    val n = b.length
    val p = frameStart(b)
    if (p < 0 || p + 4 > n) return null
    if (u8(b, p) != 0xff || (u8(b, p + 1) & 0xe0) != 0xe0) return null // sync
    val verBits = (u8(b, p + 1) >> 3) & 3
    val layerBits = (u8(b, p + 1) >> 1) & 3
    if (verBits == 1 || layerBits == 0) return null // reserved
    val brIdx = (u8(b, p + 2) >> 4) & 0xf
    if (brIdx == 0 || brIdx == 15) return null // free / invalid
    val srIdx = (u8(b, p + 2) >> 2) & 3
    if (srIdx == 3) return null // reserved
    val version = verBits match {
      case 3 => "mpeg1"
      case 2 => "mpeg2"
      case _ => "mpeg2.5"
    }
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(6)
    r.update(0, UTF8String.fromString("mp3"))
    r.update(1, UTF8String.fromString(version))
    r.setInt(2, 4 - layerBits) // layer bits 3/2/1 → layer I/II/III
    r.setInt(3, bitrateTable(verBits, layerBits)(brIdx))
    r.setInt(4, sampleRateTable(verBits)(srIdx))
    r.setInt(5, if (((u8(b, p + 3) >> 6) & 3) == 3) 1 else 2)
    r
  }
}

/** `Mp3Meta(binary)` ⇒ struct(format, version, layer, bitrate_kbps,
  * sample_rate, channels), null for non-MP3 payloads. Codegen'd via a
  * static call — one narrow pass, no UDF boundary (§2.10 surface).
  */
case class Mp3Meta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("version", StringType),
    StructField("layer", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Mp3Headers.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val r = ctx.freshName("mp3")
      s"""
         |InternalRow $r = graft.plans.Mp3Headers.parseRow($bytes);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp3Meta {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(bin: Column): Column =
    ColumnBridge.column(Mp3Meta(ColumnBridge.expression(bin)))
}
