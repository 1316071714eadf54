package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM WAV (RIFF) container header parsing — byte arithmetic only, no
  * audio library (the audio analog of ImageHeaders): a RIFF/WAVE signature
  * check then a chunk walk latching the FIRST `fmt ` chunk (channels /
  * sample rate / bits per sample at fixed offsets inside it) and the first
  * `data` chunk's byte size (duration = data_bytes / byte_rate, left to the
  * caller). Chunks are word-aligned — odd sizes carry a pad byte. Anything
  * unrecognized or truncated parses to null. The identical decision
  * procedure runs in DuckDB SQL (`MediaSql.wavCtes` — recursive-CTE chunk
  * walk), which is what makes mm04 oracle-checkable on real WAV bytes.
  */
object WavHeaders {

  private def u8(b: Array[Byte], i: Long): Int = b(i.toInt) & 0xff
  private def le16(b: Array[Byte], i: Long): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32u(b: Array[Byte], i: Long): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Long): String =
    new String(Array(b(i.toInt), b(i.toInt + 1), b(i.toInt + 2), b(i.toInt + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** InternalRow(format, channels, sample_rate, bits, data_bytes) or null. */
  def parseRow(b: Array[Byte]): InternalRow = {
    val n = b.length.toLong
    if (n < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return null
    var pos = 12L
    var fmtPos = -1L
    var dataBytes = -1L
    while (pos + 8 <= n) {
      val id = tag(b, pos)
      val size = le32u(b, pos + 4)
      if (id == "fmt " && fmtPos < 0 && size >= 16 && pos + 24 <= n) fmtPos = pos
      if (id == "data" && dataBytes < 0) dataBytes = size
      pos += 8 + size + (size % 2)
    }
    if (fmtPos < 0) return null
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(5)
    r.update(0, UTF8String.fromString("wav"))
    r.setInt(1, le16(b, fmtPos + 10))          // channels
    r.setLong(2, le32u(b, fmtPos + 12))        // sample_rate
    r.setInt(3, le16(b, fmtPos + 22))          // bits per sample
    if (dataBytes < 0) r.setNullAt(4) else r.setLong(4, dataBytes)
    r
  }
}

/** `AudioMeta(binary)` ⇒ struct(format, channels, sample_rate, bits,
  * data_bytes), null for non-WAV payloads. Codegen'd via a static call —
  * one narrow pass, no UDF boundary (same §2.10 surface as ImageDims).
  */
case class AudioMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("channels", IntegerType),
    StructField("sample_rate", LongType),
    StructField("bits", IntegerType),
    StructField("data_bytes", LongType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WavHeaders.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val r = ctx.freshName("wav")
      s"""
         |InternalRow $r = graft.plans.WavHeaders.parseRow($bytes);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioMeta {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(bin: Column): Column =
    ColumnBridge.column(AudioMeta(ColumnBridge.expression(bin)))
}
