package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM image container header parsing — byte arithmetic only, no codec
  * or imaging library. Covers the four containers whose dimensions live in a
  * fixed or scannable header position:
  *
  *  - PNG:  8-byte signature, IHDR chunk ⇒ width/height big-endian 32-bit at
  *          byte offsets 16/20.
  *  - JPEG: FF D8 FF signature, then a marker-segment scan to the first SOF
  *          (start-of-frame FFC0–FFCF minus DHT/JPG/DAC) ⇒ height/width
  *          big-endian 16-bit at SOF+5/SOF+7.
  *  - GIF:  "GIF87a"/"GIF89a" ⇒ width/height little-endian 16-bit at 6/8.
  *  - BMP:  "BM", DIB header size at 14 ⇒ legacy BITMAPCOREHEADER (size 12)
  *          has 16-bit dims at 18/20, modern headers have signed 32-bit dims
  *          at 18/22 (height negative for top-down rows ⇒ abs).
  *  - TIFF: "II*\0" (little-endian) or "MM\0*" (big-endian), IFD0 offset at
  *          4 ⇒ walk the IFD's 12-byte entries for tags 256/257
  *          (ImageWidth/ImageLength), SHORT or LONG, value inline in the
  *          entry's value field IN FILE BYTE ORDER (a SHORT sits in the
  *          field's first two bytes).
  *  - WebP: "RIFF"+"WEBP" container; first chunk decides the flavor —
  *          VP8X extended ⇒ 24-bit LE canvas dims minus one at 24/27;
  *          "VP8 " lossy ⇒ 9D 01 2A sync then 14-bit LE dims at 26/28;
  *          VP8L lossless ⇒ 0x2F then two 14-bit fields packed LE at 21.
  *
  * Anything else (including truncated headers) parses to null. The same
  * decision procedure is mirrored in DuckDB SQL (hex-string byte arithmetic,
  * recursive CTE for the JPEG scan) by `graft.queries.MediaSql`, which is
  * what makes the mm-queries oracle-checkable on real image bytes.
  */
object ImageHeaders {

  /** (format, width, height), or None when `bytes` is not a recognized
    * image header. Total function of the leading bytes — no exceptions.
    */
  def parse(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    val r = parseRow(bytes)
    if (r == null) None
    else Some((r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private def row(fmt: String, w: Long, h: Long): InternalRow = {
    val r = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    r.update(0, UTF8String.fromString(fmt))
    r.setInt(1, w.toInt)
    r.setInt(2, h.toInt)
    r
  }

  /** SOF0–SOF15 carry frame dimensions; C4=DHT, C8=JPG, CC=DAC do not. */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** InternalRow(format UTF8String, width Int, height Int) or null — the
    * codegen-callable form (static forwarder reachable from generated Java).
    */
  def parseRow(b: Array[Byte]): InternalRow = {
    val n = b.length
    // PNG: signature + IHDR must be the first chunk (per spec)
    if (n >= 24 && u8(b, 0) == 0x89 && u8(b, 1) == 0x50 && u8(b, 2) == 0x4e &&
        u8(b, 3) == 0x47 && u8(b, 4) == 0x0d && u8(b, 5) == 0x0a &&
        u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
        u8(b, 12) == 'I' && u8(b, 13) == 'H' && u8(b, 14) == 'D' && u8(b, 15) == 'R') {
      row("png", be32(b, 16), be32(b, 20))
    } else if (n >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8 && u8(b, 2) == 0xff) {
      // JPEG: scan marker segments from offset 2 to the first SOF
      var pos = 2
      while (pos + 3 < n) {
        if (u8(b, pos) != 0xff) return null // desynced — not a marker
        val marker = u8(b, pos + 1)
        if (marker == 0xff) pos += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
          pos += 2 // standalone TEM/RSTn/SOI
        } else if (marker == 0xd9 || marker == 0xda) {
          return null // EOI or SOS: entropy data next, no SOF seen
        } else {
          val segLen = be16(b, pos + 2)
          if (segLen < 2) return null
          if (isSof(marker)) {
            if (pos + 8 >= n) return null
            return row("jpeg", be16(b, pos + 7), be16(b, pos + 5))
          }
          pos += 2 + segLen
        }
      }
      null
    } else if (n >= 10 && u8(b, 0) == 'G' && u8(b, 1) == 'I' && u8(b, 2) == 'F' &&
        u8(b, 3) == '8' && (u8(b, 4) == '7' || u8(b, 4) == '9') && u8(b, 5) == 'a') {
      row("gif", le16(b, 6), le16(b, 8))
    } else if (n >= 26 && u8(b, 0) == 'B' && u8(b, 1) == 'M') {
      val hdrSize = le32(b, 14)
      if (hdrSize == 12) row("bmp", le16(b, 18), le16(b, 20)) // BITMAPCOREHEADER
      else row("bmp", le32(b, 18).toLong, math.abs(le32(b, 22).toLong))
    } else if (n >= 8 &&
        ((u8(b, 0) == 'I' && u8(b, 1) == 'I' && u8(b, 2) == 0x2a && u8(b, 3) == 0) ||
         (u8(b, 0) == 'M' && u8(b, 1) == 'M' && u8(b, 2) == 0 && u8(b, 3) == 0x2a))) {
      // TIFF: endianness from the magic, then one IFD0 walk
      val le = u8(b, 0) == 'I'
      def u16(i: Int): Int = if (le) le16(b, i) else be16(b, i)
      def u32(i: Int): Long = if (le) le32(b, i).toLong & 0xffffffffL else be32(b, i)
      val ifd = u32(4)
      if (ifd < 8 || ifd + 2 > n) null
      else {
        val cnt = u16(ifd.toInt)
        if (ifd + 2 + cnt * 12L > n) null // truncated entry table
        else {
          var (w, hh) = (-1L, -1L)
          var i = 0
          while (i < cnt) {
            val e = ifd.toInt + 2 + 12 * i
            val tag = u16(e)
            val v: Long = u16(e + 2) match {
              case 3 => u16(e + 8) // SHORT, first two value-field bytes
              case 4 => u32(e + 8) // LONG
              case _ => -1L
            }
            // Duplicate/odd-typed entries: fold with max, mirroring the
            // oracle's MAX(CASE WHEN tag=...) — an unknown-type entry (-1)
            // can't erase a valid one, and on duplicates the largest wins
            // in both engines.
            if (tag == 256) w = math.max(w, v)
            else if (tag == 257) hh = math.max(hh, v)
            i += 1
          }
          if (w >= 0 && hh >= 0) row("tiff", w, hh) else null
        }
      }
    } else if (n >= 25 && u8(b, 0) == 'R' && u8(b, 1) == 'I' && u8(b, 2) == 'F' &&
        u8(b, 3) == 'F' && u8(b, 8) == 'W' && u8(b, 9) == 'E' &&
        u8(b, 10) == 'B' && u8(b, 11) == 'P' &&
        u8(b, 12) == 'V' && u8(b, 13) == 'P' && u8(b, 14) == '8') {
      val flavor = u8(b, 15)
      if (flavor == 'X' && n >= 30) {
        // VP8X: flags(1) + reserved(3), then 24-bit LE canvas dims minus one
        row("webp", 1L + le24(b, 24), 1L + le24(b, 27))
      } else if (flavor == ' ' && n >= 30 &&
          u8(b, 23) == 0x9d && u8(b, 24) == 0x01 && u8(b, 25) == 0x2a) {
        // VP8 lossy: 3-byte frame tag, sync code, 14-bit LE dims
        row("webp", le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff)
      } else if (flavor == 'L' && u8(b, 20) == 0x2f) {
        // VP8L lossless: signature 0x2F then width-1 / height-1 as two
        // 14-bit fields packed little-endian
        val v = le32(b, 21)
        row("webp", 1L + (v & 0x3fff), 1L + ((v >>> 14) & 0x3fff))
      } else null
    } else null
  }
}

/** `ImageDims(binary)` ⇒ struct(format string, width int, height int), null
  * when the bytes are not a recognized PNG/JPEG/GIF/BMP/WebP header (SURVEY.md
  * §2.10 custom-Expression surface). Runs inside whole-stage codegen via a
  * static call — one narrow pass, no UDF/serialization boundary.
  */
case class ImageDims(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ImageHeaders.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, bytes => {
      val r = ctx.freshName("dims")
      s"""
         |InternalRow $r = graft.plans.ImageHeaders.parseRow($bytes);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageDims {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(bin: Column): Column =
    ColumnBridge.column(ImageDims(ColumnBridge.expression(bin)))
}
