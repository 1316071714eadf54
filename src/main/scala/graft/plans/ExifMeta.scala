package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}

/** EXIF orientation (tag 0x0112) from JPEG bytes — the rotation-normalize
  * signal an image-curation pipeline needs before any pixel work (a camera
  * that stored the sensor scan rotated marks it here; 1 = upright,
  * 3/6/8 = 180/270/90 degrees, 2/4/5/7 = mirrored variants).
  *
  * Pure byte arithmetic, no imaging library: the JPEG marker walk of
  * `ImageHeaders.parseRow` (fill bytes, standalone markers, abort on
  * EOI/SOS/desync) runs until the first APP1 segment whose body opens with
  * "Exif\0\0" and is fully readable; the remainder of that segment is a
  * TIFF blob (endianness from its own magic) whose IFD0 is walked exactly
  * like the TIFF-dims branch — SHORT (type 3) entries for tag 274 fold
  * with max (duplicates/odd types can't erase a valid value, mirroring the
  * oracle's MAX pivot). Everything else — no APP1, non-Exif APP1 only,
  * truncated segment or entry table, missing tag, non-SHORT tag — is null
  * in BOTH engines. Oracle mirror: `graft.queries.MediaSql.exifCtes`.
  */
object ExifHeaders {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) |
      (u8(b, i + 3).toLong << 24)

  /** -1 when absent/undecodable (the codegen-callable form: a primitive
    * return keeps the generated code boxing-free; the Expression maps -1 to
    * SQL null).
    */
  def orientation(b: Array[Byte]): Int = {
    val n = b.length
    if (n < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8 || u8(b, 2) != 0xff) return -1
    var pos = 2
    while (pos + 3 < n) {
      if (u8(b, pos) != 0xff) return -1 // desynced — not a marker
      val marker = u8(b, pos + 1)
      if (marker == 0xff) pos += 1 // fill byte
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) pos += 2
      else if (marker == 0xd9 || marker == 0xda) return -1 // EOI/SOS: give up
      else {
        val segLen = be16(b, pos + 2)
        if (segLen < 2) return -1
        // APP1 holding "Exif\0\0" + at least a TIFF header, fully readable
        if (marker == 0xe1 && segLen >= 16 && pos + 2 + segLen <= n &&
            u8(b, pos + 4) == 'E' && u8(b, pos + 5) == 'x' &&
            u8(b, pos + 6) == 'i' && u8(b, pos + 7) == 'f' &&
            u8(b, pos + 8) == 0 && u8(b, pos + 9) == 0) {
          return tiffOrientation(b, pos + 10, pos + 2 + segLen)
        }
        pos += 2 + segLen
      }
    }
    -1
  }

  /** IFD0 walk over the TIFF blob at [base, end): tag 274, SHORT only. */
  private def tiffOrientation(b: Array[Byte], base: Int, end: Int): Int = {
    val n2 = end - base
    if (n2 < 8) return -1
    val le =
      if (u8(b, base) == 'I' && u8(b, base + 1) == 'I' &&
          u8(b, base + 2) == 0x2a && u8(b, base + 3) == 0) true
      else if (u8(b, base) == 'M' && u8(b, base + 1) == 'M' &&
          u8(b, base + 2) == 0 && u8(b, base + 3) == 0x2a) false
      else return -1
    def u16r(i: Long): Int =
      if (le) le16(b, base + i.toInt) else be16(b, base + i.toInt)
    def u32r(i: Long): Long =
      if (le) le32(b, base + i.toInt) else be32(b, base + i.toInt)
    val ifd = u32r(4)
    if (ifd < 8 || ifd + 2 > n2) return -1
    val cnt = u16r(ifd)
    if (ifd + 2 + cnt * 12L > n2) return -1 // truncated entry table
    var ori = -1
    var i = 0
    while (i < cnt) {
      val e = ifd + 2 + 12L * i
      if (u16r(e) == 274) {
        val v = if (u16r(e + 2) == 3) u16r(e + 8) else -1
        if (v > ori) ori = v
      }
      i += 1
    }
    ori
  }
}

/** `ExifOrientation(binary)` ⇒ int, null when the bytes carry no decodable
  * EXIF orientation. Runs inside whole-stage codegen via a static call —
  * one narrow pass, no UDF/serialization boundary.
  */
case class ExifOrientation(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val o = ExifHeaders.orientation(input.asInstanceOf[Array[Byte]])
    if (o < 0) null else o
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val o = ctx.freshName("ori")
      s"""
         |int $o = graft.plans.ExifHeaders.orientation($bytes);
         |if ($o < 0) { ${ev.isNull} = true; } else { ${ev.value} = $o; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExifOrientation {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(bin: Column): Column =
    ColumnBridge.column(ExifOrientation(ColumnBridge.expression(bin)))
}
