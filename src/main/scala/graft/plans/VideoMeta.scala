package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM MP4 (ISO base media file format) metadata — byte arithmetic
  * only, the video analog of ImageHeaders/WavHeaders: require a leading
  * `ftyp` box, walk the top-level box sequence to `moov`, walk `moov`'s
  * children to `mvhd`, and read timescale/duration (version 0: 32-bit at
  * +20/+24; version 1: at +28 with a 64-bit duration at +32). Box sizes
  * honor the spec's special cases — size 1 ⇒ 64-bit largesize, size 0 ⇒
  * box runs to end-of-file, any other size < 8 ⇒ malformed, stop. Anything
  * unrecognized parses to null. `MediaSql.mp4Ctes` replays the identical
  * walk in DuckDB SQL, making mm05 oracle-checkable on real MP4 bytes.
  */
object Mp4Headers {

  private def u8(b: Array[Byte], i: Long): Int = b(i.toInt) & 0xff
  private def be32u(b: Array[Byte], i: Long): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Long): Long =
    (be32u(b, i) << 32) | be32u(b, i + 4)
  private def tag(b: Array[Byte], i: Long): String =
    new String(Array(b(i.toInt), b(i.toInt + 1), b(i.toInt + 2), b(i.toInt + 3)),
      java.nio.charset.StandardCharsets.US_ASCII)

  /** (boxEnd, headerLen) for the box at `pos`, or null when malformed.
    * Mirrors the SQL scan's size-decoding CASE exactly.
    */
  private def boxEnd(b: Array[Byte], pos: Long, n: Long): Option[Long] = {
    val size = be32u(b, pos)
    if (size == 0) Some(n)                       // to end of file
    else if (size == 1) {
      if (pos + 16 > n) None
      else {
        val ls = be64(b, pos + 8)
        if (ls < 16) None else Some(pos + ls)
      }
    } else if (size < 8) None
    else Some(pos + size)
  }

  /** InternalRow(format, timescale, duration) or null. */
  def parseRow(b: Array[Byte]): InternalRow = {
    val n = b.length.toLong
    if (n < 12 || tag(b, 4) != "ftyp") return null
    // top-level walk to moov
    var pos = 0L
    var moov = -1L
    var moovEnd = -1L
    while (moov < 0 && pos + 8 <= n) {
      boxEnd(b, pos, n) match {
        case None => return null
        case Some(end) =>
          if (end <= pos) return null
          if (tag(b, pos + 4) == "moov") { moov = pos; moovEnd = math.min(end, n) }
          pos = end
      }
    }
    if (moov < 0) return null
    // moov-children walk to mvhd
    var cpos = moov + 8
    var mvhd = -1L
    while (mvhd < 0 && cpos + 8 <= moovEnd) {
      boxEnd(b, cpos, moovEnd) match {
        case None => return null
        case Some(end) =>
          if (end <= cpos) return null
          if (tag(b, cpos + 4) == "mvhd") mvhd = cpos
          cpos = end
      }
    }
    if (mvhd < 0) return null
    val version = if (mvhd + 9 <= n) u8(b, mvhd + 8) else return null
    val (timescale, duration) =
      if (version == 0) {
        if (mvhd + 28 > n) return null
        (be32u(b, mvhd + 20), be32u(b, mvhd + 24))
      } else if (version == 1) {
        if (mvhd + 40 > n) return null
        (be32u(b, mvhd + 28), be64(b, mvhd + 32))
      } else return null
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    r.update(0, UTF8String.fromString("mp4"))
    r.setLong(1, timescale)
    r.setLong(2, duration)
    r
  }
}

/** `VideoMeta(binary)` ⇒ struct(format, timescale, duration), null for
  * non-MP4 payloads. Codegen'd via a static call (§2.10 surface).
  */
case class VideoMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("timescale", LongType),
    StructField("duration", LongType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    Mp4Headers.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val r = ctx.freshName("mp4")
      s"""
         |InternalRow $r = graft.plans.Mp4Headers.parseRow($bytes);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VideoMeta {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(bin: Column): Column =
    ColumnBridge.column(VideoMeta(ColumnBridge.expression(bin)))
}
