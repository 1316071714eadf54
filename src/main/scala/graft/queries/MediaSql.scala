package graft.queries

/** DuckDB SQL mirror of `graft.plans.ImageHeaders` — the same header
  * decision procedure expressed as hex-string byte arithmetic (DuckDB has no
  * blob indexing, but `hex(blob)` + `substr`/`strpos` gives exact byte
  * values), with a recursive CTE standing in for the JPEG marker scan.
  * Keeping the two decision procedures in lockstep is what makes the
  * multimodal queries hash-checkable against the oracle on real image bytes.
  */
object MediaSql {

  /** Value of byte `pos` (0-based SQL expression) of hex-string column `h`. */
  def byteAt(h: String, pos: String): String =
    s"((strpos('0123456789ABCDEF', substr($h, 2*($pos)+1, 1))-1)*16" +
      s" + (strpos('0123456789ABCDEF', substr($h, 2*($pos)+2, 1))-1))"

  def byteAt(h: String, pos: Int): String = byteAt(h, pos.toString)

  def be16(h: String, pos: String): String =
    s"(${byteAt(h, pos)}*256 + ${byteAt(h, s"($pos)+1")})"
  def be16(h: String, pos: Int): String = be16(h, pos.toString)

  def le16(h: String, pos: Int): String =
    s"(${byteAt(h, pos)} + ${byteAt(h, pos + 1)}*256)"

  def be32(h: String, pos: Int): String =
    s"(${byteAt(h, pos)}*16777216 + ${byteAt(h, pos + 1)}*65536" +
      s" + ${byteAt(h, pos + 2)}*256 + ${byteAt(h, pos + 3)})"

  /** Signed little-endian int32 at byte `pos`. */
  def le32s(h: String, pos: Int): String = {
    val u = s"(${byteAt(h, pos)} + ${byteAt(h, pos + 1)}*256" +
      s" + ${byteAt(h, pos + 2)}*65536 + ${byteAt(h, pos + 3)}*16777216)"
    s"(CASE WHEN $u >= 2147483648 THEN $u - 4294967296 ELSE $u END)"
  }

  val PngSigHex = "89504E470D0A1A0A"
  val IhdrHex = "49484452"
  val Gif87Hex = "474946383761"
  val Gif89Hex = "474946383961"

  /** Fixed-offset branches (everything except JPEG), as (condition, format,
    * width, height) tuples over a relation exposing hex column `h` and byte
    * length `n`. Branch order matches the parser; magics are mutually
    * exclusive so order only matters for readability.
    */
  def fixedBranches(h: String, n: String): Seq[(String, String, String, String)] = Seq(
    (s"$n >= 24 AND substr($h,1,16) = '$PngSigHex' AND substr($h,25,8) = '$IhdrHex'",
      "png", be32(h, 16), be32(h, 20)),
    (s"$n >= 10 AND substr($h,1,12) IN ('$Gif87Hex','$Gif89Hex')",
      "gif", le16(h, 6), le16(h, 8)),
    (s"$n >= 26 AND substr($h,1,4) = '424D' AND ${le32s(h, 14)} = 12",
      "bmp", le16(h, 18), le16(h, 20)),
    (s"$n >= 26 AND substr($h,1,4) = '424D' AND ${le32s(h, 14)} <> 12",
      "bmp", le32s(h, 18), s"abs(${le32s(h, 22)})"))

  /** The JPEG marker-scan as recursive-CTE SQL. `src` must expose columns
    * (`key`, `h`, `n`); emits CTEs `jscan` and `jpegdims(key, format, w, h)`.
    * Mirrors ImageHeaders.parseRow's loop exactly: fill bytes advance 1,
    * standalone TEM/RST/SOI advance 2, EOI/SOS/bad-length/desync abort,
    * SOF with 8 readable bytes emits a found row that stops recursing.
    */
  def jpegScanCtes(src: String): String = {
    val b = (p: String) => byteAt("h", p)
    s"""jscan AS (
       |  SELECT key, h, n, 2 AS pos, CAST(NULL AS INTEGER) AS sof
       |  FROM $src WHERE n >= 4 AND substr(h,1,6) = 'FFD8FF'
       |  UNION ALL
       |  SELECT key, h, n,
       |    CASE WHEN sof_marker THEN pos
       |         WHEN marker = 255 THEN pos + 1
       |         WHEN marker = 1 OR (marker BETWEEN 208 AND 216) THEN pos + 2
       |         ELSE pos + 2 + seglen END AS pos,
       |    CASE WHEN sof_marker THEN pos END AS sof
       |  FROM (
       |    SELECT key, h, n, pos, marker, seglen,
       |      (marker BETWEEN 192 AND 207) AND marker NOT IN (196, 200, 204) AS sof_marker
       |    FROM (
       |      SELECT key, h, n, pos, ${b("pos+1")} AS marker,
       |        ${be16("h", "pos+2")} AS seglen
       |      FROM jscan
       |      WHERE sof IS NULL AND pos + 3 < n AND ${b("pos")} = 255))
       |  WHERE marker = 255
       |     OR marker = 1 OR (marker BETWEEN 208 AND 216)
       |     OR (marker NOT IN (217, 218) AND seglen >= 2
       |         AND (NOT sof_marker OR pos + 8 < n))
       |),
       |jpegdims AS (
       |  SELECT key, 'jpeg' AS format,
       |    ${be16("h", "sof+7")} AS w, ${be16("h", "sof+5")} AS h_px
       |  FROM jscan WHERE sof IS NOT NULL
       |)""".stripMargin
  }

  def le16(h: String, pos: String): String =
    s"(${byteAt(h, pos)} + ${byteAt(h, s"($pos)+1")}*256)"

  /** Unsigned little-endian int32 at byte expression `pos`. */
  def le32u(h: String, pos: String): String =
    s"(${byteAt(h, pos)} + ${byteAt(h, s"($pos)+1")}*256" +
      s" + ${byteAt(h, s"($pos)+2")}*65536 + ${byteAt(h, s"($pos)+3")}*16777216)"

  /** Unsigned little-endian int24 at byte `pos`. */
  def le24(h: String, pos: Int): String =
    s"(${byteAt(h, pos)} + ${byteAt(h, pos + 1)}*256 + ${byteAt(h, pos + 2)}*65536)"

  /** The WebP branches of `graft.plans.ImageHeaders` over `src(key, h, n)`:
    * emits CTE `webpdims(key, format, w, h_px)`. Fixed offsets only (the
    * container stores dims in the first chunk), so no recursion: VP8X
    * extended = 24-bit LE canvas minus-one at 24/27; "VP8 " lossy = sync
    * 9D012A then 14-bit LE dims at 26/28; VP8L lossless = 0x2F then two
    * packed 14-bit fields at 21.
    */
  def webpCtes(src: String): String = {
    val riff = s"substr(h,1,8) = '52494646' AND substr(h,17,8) = '57454250'"
    val vp8l = s"(${le32u("h", "21")})"
    s"""webpdims0 AS (
       |  SELECT key, 'webp' AS format,
       |    CASE WHEN substr(h,25,8) = '56503858' AND n >= 30
       |           THEN 1 + ${le24("h", 24)}
       |         WHEN substr(h,25,8) = '56503820' AND n >= 30
       |              AND substr(h,47,6) = '9D012A'
       |           THEN ${le16("h", 26)} % 16384
       |         WHEN substr(h,25,8) = '5650384C' AND ${byteAt("h", 20)} = 47
       |           THEN 1 + ($vp8l % 16384)
       |    END AS w,
       |    CASE WHEN substr(h,25,8) = '56503858' AND n >= 30
       |           THEN 1 + ${le24("h", 27)}
       |         WHEN substr(h,25,8) = '56503820' AND n >= 30
       |              AND substr(h,47,6) = '9D012A'
       |           THEN ${le16("h", 28)} % 16384
       |         WHEN substr(h,25,8) = '5650384C' AND ${byteAt("h", 20)} = 47
       |           THEN 1 + (($vp8l // 16384) % 16384)
       |    END AS h_px
       |  FROM $src
       |  WHERE n >= 25 AND $riff),
       |webpdims AS (
       |  SELECT key, format, w, h_px FROM webpdims0 WHERE w IS NOT NULL)""".stripMargin
  }

  /** The TIFF branch of `graft.plans.ImageHeaders` over `src(key, h, n)`:
    * emits CTEs ending in `tiffdims(key, format, w, h_px)`. No recursion —
    * the IFD entry table's size is known up front, so the walk is one
    * `unnest(range(cnt))` expansion (guarded: the whole table must be
    * readable, like the parser's truncation check), a per-entry value
    * decode in FILE byte order (SHORT in the value field's first two
    * bytes), and a tag-256/257 pivot.
    */
  def tiffCtes(src: String): String = {
    def u16(pos: String) =
      s"(CASE WHEN le THEN ${le16("h", pos)} ELSE ${be16("h", pos)} END)"
    def u32(pos: String) =
      s"(CASE WHEN le THEN ${le32u("h", pos)} ELSE ${be32u("h", pos)} END)"
    s"""tiff0 AS (
       |  SELECT key, h, n, substr(h,1,8) = '49492A00' AS le,
       |    CASE WHEN substr(h,1,8) = '49492A00' THEN ${le32u("h", "4")}
       |         ELSE ${be32u("h", "4")} END AS ifd
       |  FROM $src
       |  WHERE n >= 8 AND substr(h,1,8) IN ('49492A00','4D4D002A')),
       |tiff1 AS (
       |  SELECT key, h, n, le, ifd, ${u16("ifd")} AS cnt
       |  FROM tiff0 WHERE ifd >= 8 AND ifd + 2 <= n),
       |tiffent AS (
       |  SELECT key, h, le, ifd + 2 + 12*i AS e
       |  FROM (SELECT key, h, le, ifd, unnest(range(cnt)) AS i
       |        FROM tiff1 WHERE ifd + 2 + 12*cnt <= n)),
       |tiffvals AS (
       |  SELECT key, ${u16("e")} AS tag,
       |    CASE WHEN ${u16("e+2")} = 3 THEN ${u16("e+8")}
       |         WHEN ${u16("e+2")} = 4 THEN ${u32("e+8")}
       |         ELSE -1 END AS v
       |  FROM tiffent),
       |tiffdims AS (
       |  SELECT key, format, w, h_px FROM (
       |    SELECT key, 'tiff' AS format,
       |      MAX(CASE WHEN tag = 256 THEN v END) AS w,
       |      MAX(CASE WHEN tag = 257 THEN v END) AS h_px
       |    FROM tiffvals GROUP BY key)
       |  WHERE w >= 0 AND h_px >= 0)""".stripMargin
  }

  /** The WAV (RIFF) chunk walk of `graft.plans.WavHeaders` as recursive-CTE
    * SQL over `src(key, h, n)`; emits `wscan` and `wavmeta(key, format,
    * channels, sample_rate, bits, data_bytes)`. Latch-first `fmt ` (size ≥
    * 16, fully readable) and `data` sizes; chunks advance 8 + size + pad.
    */
  def wavCtes(src: String): String =
    s"""wscan AS (
       |  SELECT key, h, n, CAST(12 AS BIGINT) AS pos,
       |    CAST(NULL AS BIGINT) AS fmtpos, CAST(NULL AS BIGINT) AS databytes
       |  FROM $src
       |  WHERE n >= 12 AND substr(h,1,8) = '52494646' AND substr(h,17,8) = '57415645'
       |  UNION ALL
       |  SELECT key, h, n, pos + 8 + size + (size % 2) AS pos,
       |    CASE WHEN cid = '666D7420' AND fmtpos IS NULL AND size >= 16
       |              AND pos + 24 <= n THEN pos ELSE fmtpos END AS fmtpos,
       |    CASE WHEN cid = '64617461' AND databytes IS NULL THEN size
       |         ELSE databytes END AS databytes
       |  FROM (
       |    SELECT key, h, n, pos, fmtpos, databytes,
       |      substr(h, 2*pos+1, 8) AS cid, ${le32u("h", "pos+4")} AS size
       |    FROM wscan WHERE pos + 8 <= n)
       |),
       |wavmeta AS (
       |  SELECT key, 'wav' AS format,
       |    CAST(${le16("h", "fmtpos+10")} AS INTEGER) AS channels,
       |    CAST(${le32u("h", "fmtpos+12")} AS BIGINT) AS sample_rate,
       |    CAST(${le16("h", "fmtpos+22")} AS INTEGER) AS bits,
       |    CAST(databytes AS BIGINT) AS data_bytes
       |  FROM (
       |    SELECT key, h, MAX(fmtpos) AS fmtpos, MAX(databytes) AS databytes
       |    FROM wscan GROUP BY key, h)
       |  WHERE fmtpos IS NOT NULL
       |)""".stripMargin

  /** The PCM16 resample replay of `Multimodal.resampleWavPcm16` over
    * `src(key, h, n)`: the [[wavCtes]] chunk walk extended with the data
    * chunk's OFFSET, the PCM16 acceptance gate (codec 1, 16-bit, sane
    * channels/rate, data chunk fully inside the payload, non-empty and
    * allocatable output), and a hex copy of every nearest-mapped output
    * frame (`i·nframes DIV out_frames`, all channel bytes). Emits CTEs
    * ending in `wavresampled(key, channels, src_rate, out_frames, out_len,
    * outhex)` — quarantined keys simply have no row. Bounds mirror
    * `Multimodal.decodeWavPcm16` bit for bit — change them in lockstep.
    */
  /** The `Multimodal.decodeWavPcm16` gate over `src(key, h, n)` as CTEs
    * ending in `wavpcm(key, h, channels, src_rate, datapos, nframes,
    * out_frames)` — one row per complete PCM16 WAV with a non-empty,
    * allocatable resample at `dstRate`; bounds in lockstep with the JVM
    * decode (change them together). Shared by the resample and
    * fingerprint replays.
    */
  def wavPcm16GateCtes(src: String, dstRate: Int): String =
    s"""rscan AS (
       |  SELECT key, h, n, CAST(12 AS BIGINT) AS pos,
       |    CAST(NULL AS BIGINT) AS fmtpos, CAST(NULL AS BIGINT) AS datapos,
       |    CAST(NULL AS BIGINT) AS databytes
       |  FROM $src
       |  WHERE n >= 12 AND substr(h,1,8) = '52494646' AND substr(h,17,8) = '57415645'
       |  UNION ALL
       |  SELECT key, h, n, pos + 8 + size + (size % 2) AS pos,
       |    CASE WHEN cid = '666D7420' AND fmtpos IS NULL AND size >= 16
       |              AND pos + 24 <= n THEN pos ELSE fmtpos END AS fmtpos,
       |    CASE WHEN cid = '64617461' AND datapos IS NULL THEN pos + 8
       |         ELSE datapos END AS datapos,
       |    CASE WHEN cid = '64617461' AND databytes IS NULL THEN size
       |         ELSE databytes END AS databytes
       |  FROM (
       |    SELECT key, h, n, pos, fmtpos, datapos, databytes,
       |      substr(h, 2*pos+1, 8) AS cid, ${le32u("h", "pos+4")} AS size
       |    FROM rscan WHERE pos + 8 <= n)
       |),
       |wavpcm AS (
       |  SELECT key, h, channels, src_rate, datapos, nframes,
       |    (nframes * $dstRate) // src_rate AS out_frames
       |  FROM (
       |    SELECT key, h, n, datapos, databytes,
       |      CAST(${le16("h", "fmtpos+10")} AS INTEGER) AS channels,
       |      CAST(${le32u("h", "fmtpos+12")} AS BIGINT) AS src_rate,
       |      ${le16("h", "fmtpos+8")} AS codec,
       |      ${le16("h", "fmtpos+22")} AS bits,
       |      databytes // NULLIF(CAST(${le16("h", "fmtpos+10")} AS BIGINT) * 2, 0)
       |        AS nframes
       |    FROM (
       |      SELECT key, h, MAX(n) AS n, MAX(fmtpos) AS fmtpos,
       |        MAX(datapos) AS datapos, MAX(databytes) AS databytes
       |      FROM rscan GROUP BY key, h)
       |    WHERE fmtpos IS NOT NULL AND datapos IS NOT NULL)
       |  WHERE codec = 1 AND bits = 16 AND channels > 0 AND src_rate > 0
       |    AND datapos + databytes <= n AND nframes > 0
       |    AND (nframes * $dstRate) // src_rate > 0
       |    AND ((nframes * $dstRate) // src_rate) * channels * 2 <= 2147483647)""".stripMargin

  def wavResampleCtes(src: String, dstRate: Int): String =
    s"""${wavPcm16GateCtes(src, dstRate)},
       |wavmap AS (
       |  SELECT key, i,
       |    substr(h, 2*(datapos + ((i * nframes) // out_frames) * channels * 2) + 1,
       |           channels * 4) AS p
       |  FROM (SELECT *, unnest(range(out_frames)) AS i FROM wavpcm)),
       |wavhex AS (
       |  SELECT key, string_agg(p, '' ORDER BY i) AS outhex
       |  FROM wavmap GROUP BY key),
       |wavresampled AS (
       |  SELECT w.key, w.channels, w.src_rate,
       |    CAST(w.out_frames AS INTEGER) AS out_frames,
       |    CAST(w.out_frames * w.channels * 2 AS BIGINT) AS out_len, x.outhex
       |  FROM wavpcm w JOIN wavhex x ON x.key = w.key)""".stripMargin

  /** The 64-bit energy-delta fingerprint of `graft.plans.AudioFpKernel`
    * over `src(key, h, n)` replayed as hex arithmetic: the shared PCM16
    * gate, then every (output frame, channel) sample read straight from
    * the SOURCE hex through the nearest-frame mapping (no resampled
    * buffer, like the kernel), absolute 16-bit values summed into the 65
    * time windows (empty windows present with energy 0), and the 64
    * envelope-gradient bits folded MSB-first into the two 32-bit halves.
    * Emits CTEs ending in `wavfp(key, hi, lo)` — undecodable keys have no
    * row (callers LEFT JOIN or inner-join as the quarantine).
    */
  def wavFpCtes(src: String, dstRate: Int): String = {
    val samplePos = "datapos + (((i // channels) * nframes) // out_frames)" +
      " * channels * 2 + (i % channels) * 2"
    s"""${wavPcm16GateCtes(src, dstRate)},
       |fpsamp AS (
       |  SELECT key, ((i // channels) * 65) // out_frames AS w,
       |    abs(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END) AS av
       |  FROM (
       |    SELECT key, channels, out_frames, nframes, i,
       |      ${le16("h", samplePos)} AS v
       |    FROM (SELECT *, unnest(range(out_frames * channels)) AS i
       |          FROM wavpcm))),
       |fpwin AS (
       |  SELECT b.key, b.w, COALESCE(SUM(s.av), 0) AS e
       |  FROM (SELECT key, unnest(range(65)) AS w FROM wavpcm) b
       |  LEFT JOIN fpsamp s ON s.key = b.key AND s.w = b.w
       |  GROUP BY b.key, b.w),
       |fpbits AS (
       |  SELECT l.key, l.w AS idx, CASE WHEN l.e > r.e THEN 1 ELSE 0 END AS bit
       |  FROM fpwin l JOIN fpwin r ON r.key = l.key AND r.w = l.w + 1
       |  WHERE l.w < 64),
       |wavfp AS (
       |  SELECT key,
       |    CAST(SUM(CASE WHEN idx < 32
       |      THEN CAST(bit AS BIGINT) << (31 - idx) ELSE 0 END) AS BIGINT) AS hi,
       |    CAST(SUM(CASE WHEN idx >= 32
       |      THEN CAST(bit AS BIGINT) << (63 - idx) ELSE 0 END) AS BIGINT) AS lo
       |  FROM fpbits GROUP BY key)""".stripMargin
  }

  /** The MP3 frame-header branch of `graft.plans.Mp3Headers` over
    * `src(key, h, n)`: emits CTEs ending in `mp3meta(key, format, version,
    * layer, bitrate_kbps, sample_rate, channels)`. The bitrate/sample-rate
    * CASE chains are GENERATED from Mp3Headers' own arrays — one source of
    * truth for both engines. No recursion: only the first frame header
    * (past an optional syncsafe-sized ID3v2 tag) is read.
    */
  def mp3Ctes(src: String): String = {
    import graft.plans.Mp3Headers._
    def b(pos: String) = byteAt("h", pos)
    val id3 = "substr(h,1,6) = '494433'"
    val syncsafe =
      s"${b("6")} < 128 AND ${b("7")} < 128 AND ${b("8")} < 128 AND ${b("9")} < 128"
    val id3size =
      s"(${b("6")}*2097152 + ${b("7")}*16384 + ${b("8")}*128 + ${b("9")})"
    def brCase(tbl: Array[Int]) =
      "CASE br " + (1 to 14).map(i => s"WHEN $i THEN ${tbl(i)}").mkString(" ") + " END"
    def srCase(tbl: Array[Int]) =
      s"CASE sr WHEN 0 THEN ${tbl(0)} WHEN 1 THEN ${tbl(1)} ELSE ${tbl(2)} END"
    s"""mp30 AS (
       |  SELECT key, h, n,
       |    CASE WHEN n >= 10 AND $id3
       |         THEN (CASE WHEN $syncsafe THEN 10 + $id3size END)
       |         ELSE 0 END AS p
       |  FROM $src),
       |mp31 AS (
       |  SELECT key, ${b("p+1")} AS h1, ${b("p+2")} AS h2, ${b("p+3")} AS h3
       |  FROM mp30
       |  WHERE p IS NOT NULL AND p + 4 <= n AND ${b("p")} = 255),
       |mp32 AS (
       |  SELECT key, (h1//8)%4 AS ver, (h1//2)%4 AS lay,
       |    (h2//16)%16 AS br, (h2//4)%4 AS sr, (h3//64)%4 AS chm
       |  FROM mp31 WHERE h1 >= 224),
       |mp3meta AS (
       |  SELECT key, 'mp3' AS format,
       |    CASE ver WHEN 3 THEN 'mpeg1' WHEN 2 THEN 'mpeg2'
       |      ELSE 'mpeg2.5' END AS version,
       |    CAST(4 - lay AS INTEGER) AS layer,
       |    CAST(CASE WHEN ver = 3 AND lay = 3 THEN ${brCase(BitrateV1L1)}
       |         WHEN ver = 3 AND lay = 2 THEN ${brCase(BitrateV1L2)}
       |         WHEN ver = 3 AND lay = 1 THEN ${brCase(BitrateV1L3)}
       |         WHEN lay = 3 THEN ${brCase(BitrateV2L1)}
       |         ELSE ${brCase(BitrateV2L23)} END AS INTEGER) AS bitrate_kbps,
       |    CAST(CASE WHEN ver = 3 THEN ${srCase(SampleRateV1)}
       |         WHEN ver = 2 THEN ${srCase(SampleRateV2)}
       |         ELSE ${srCase(SampleRateV25)} END AS INTEGER) AS sample_rate,
       |    CAST(CASE WHEN chm = 3 THEN 1 ELSE 2 END AS INTEGER) AS channels
       |  FROM mp32
       |  WHERE ver <> 1 AND lay <> 0 AND br BETWEEN 1 AND 14 AND sr <> 3)""".stripMargin
  }

  /** Unsigned big-endian int32 at byte expression `pos`. */
  def be32u(h: String, pos: String): String =
    s"(${byteAt(h, pos)}*16777216 + ${byteAt(h, s"($pos)+1")}*65536" +
      s" + ${byteAt(h, s"($pos)+2")}*256 + ${byteAt(h, s"($pos)+3")})"

  /** Big-endian int64 (sum form). The BIGINT multiply overflows when the
    * high word has its top bit set, so callers must evaluate it ONLY where
    * a 64-bit field is actually present (the mp4 walk guards it behind
    * `sz = 1`); evaluated on an arbitrary box body it would make the oracle
    * ERROR on otherwise-valid files.
    */
  def be64(h: String, pos: String): String =
    s"(${be32u(h, pos)}*4294967296 + ${be32u(h, s"($pos)+4")})"

  /** One ISO-BMFF box-walk step over hex `h`: end offset of the box at
    * `pos` given scan bound `bound` — size 0 ⇒ to bound, size 1 ⇒ 64-bit
    * largesize (valid when fully readable and ≥ 16), size < 8 ⇒ NULL
    * (malformed, stops the scan). Mirrors Mp4Headers.boxEnd.
    */
  private def boxEndSql(pos: String, bound: String): String =
    s"""CASE WHEN sz = 0 THEN $bound
       |     WHEN sz = 1 THEN (CASE WHEN ($pos)+16 <= $bound AND ls >= 16
       |                            THEN ($pos)+ls END)
       |     WHEN sz < 8 THEN NULL ELSE ($pos)+sz END""".stripMargin

  /** The MP4 walk of `graft.plans.Mp4Headers` as recursive-CTE SQL over
    * `src(key, h, n)`: a top-level scan latching `moov`, a moov-children
    * scan latching `mvhd`, then the version-0/1 timescale+duration read.
    * Emits CTEs ending in `mp4meta(key, format, timescale, duration)`.
    */
  def mp4Ctes(src: String): String = {
    val Moov = "6D6F6F76"
    val Mvhd = "6D766864"
    s"""tscan AS (
       |  SELECT key, h, n, CAST(0 AS BIGINT) AS pos,
       |    CAST(NULL AS BIGINT) AS moov, CAST(NULL AS BIGINT) AS moovend
       |  FROM $src WHERE n >= 12 AND substr(h, 9, 8) = '66747970'
       |  UNION ALL
       |  SELECT key, h, n, endpos AS pos,
       |    CASE WHEN typ = '$Moov' THEN pos ELSE moov END AS moov,
       |    CASE WHEN typ = '$Moov' THEN LEAST(endpos, n) ELSE moovend END AS moovend
       |  FROM (
       |    SELECT key, h, n, pos, moov, moovend, typ,
       |      ${boxEndSql("pos", "n")} AS endpos
       |    FROM (
       |      SELECT key, h, n, pos, moov, moovend,
       |        substr(h, 2*pos+9, 8) AS typ,
       |        ${be32u("h", "pos")} AS sz,
       |        CASE WHEN ${be32u("h", "pos")} = 1 THEN ${be64("h", "pos+8")} END AS ls
       |      FROM tscan WHERE moov IS NULL AND pos + 8 <= n))
       |  WHERE endpos IS NOT NULL AND endpos > pos
       |),
       |tmoov AS (
       |  SELECT key, h, n, MAX(moov) AS moov, MAX(moovend) AS moovend
       |  FROM tscan GROUP BY key, h, n HAVING MAX(moov) IS NOT NULL
       |),
       |mscan AS (
       |  SELECT key, h, n, moovend, moov + 8 AS pos, CAST(NULL AS BIGINT) AS mvhd
       |  FROM tmoov
       |  UNION ALL
       |  SELECT key, h, n, moovend, endpos AS pos,
       |    CASE WHEN typ = '$Mvhd' THEN pos ELSE mvhd END AS mvhd
       |  FROM (
       |    SELECT key, h, n, moovend, pos, mvhd, typ,
       |      ${boxEndSql("pos", "moovend")} AS endpos
       |    FROM (
       |      SELECT key, h, n, moovend, pos, mvhd,
       |        substr(h, 2*pos+9, 8) AS typ,
       |        ${be32u("h", "pos")} AS sz,
       |        CASE WHEN ${be32u("h", "pos")} = 1 THEN ${be64("h", "pos+8")} END AS ls
       |      FROM mscan WHERE mvhd IS NULL AND pos + 8 <= moovend))
       |  WHERE endpos IS NOT NULL AND endpos > pos
       |),
       |mp4meta AS (
       |  SELECT key, 'mp4' AS format,
       |    CASE WHEN ver = 0 THEN ${be32u("h", "mvhd+20")}
       |         ELSE ${be32u("h", "mvhd+28")} END AS timescale,
       |    CASE WHEN ver = 0 THEN ${be32u("h", "mvhd+24")}
       |         ELSE ${be64("h", "mvhd+32")} END AS duration
       |  FROM (
       |    SELECT key, h, n, ${byteAt("h", "mvhd+8")} AS ver, mvhd
       |    FROM (SELECT key, h, n, MAX(mvhd) AS mvhd FROM mscan
       |          GROUP BY key, h, n HAVING MAX(mvhd) IS NOT NULL))
       |  WHERE (ver = 0 AND mvhd + 28 <= n) OR (ver = 1 AND mvhd + 40 <= n)
       |)""".stripMargin
  }

  /** Full dims relation over `src(key, h, n)`: one row per key that parses,
    * columns (key, format, w, h_px). Combine with a LEFT JOIN for nulls.
    * `includeJpeg = false` drops the recursive scan for inputs that provably
    * cannot carry the JPEG magic (e.g. valid UTF-8 text: 0xFF is never a
    * UTF-8 byte, and PNG's 0x89 is never a UTF-8 FIRST byte — those branches
    * are unreachable, but the cheap fixed-offset ones stay mirrored).
    */
  def dimsCtes(src: String, includeJpeg: Boolean = true): String = {
    val fixed = fixedBranches("h", "n").map { case (cond, fmt, w, hpx) =>
      s"SELECT key, '$fmt' AS format, $w AS w, $hpx AS h_px FROM $src WHERE $cond"
    }.mkString("\n  UNION ALL ")
    if (includeJpeg)
      s"""${jpegScanCtes(src)},
         |alldims AS (
         |  $fixed
         |  UNION ALL SELECT key, format, w, h_px FROM jpegdims
         |)""".stripMargin
    else s"alldims AS (\n  $fixed\n)"
  }

  /** The nearest-neighbor BMP resample of
    * `graft.operators.Multimodal.resizeBmp24Nearest` over `src(key, h, n)`
    * replayed as hex arithmetic: decode gate (uncompressed 24bpp,
    * BITMAPINFOHEADER or later, complete pixel array — bounds in lockstep
    * with `decodeBmp24`), the aspect-fit geometry (`resizeFitSql`), then
    * one row per OUTPUT pixel via unnest(range(ow·oh)) picking its source
    * BGR triple straight from the hex string (bottom-up rows + 4-byte
    * stride honored, top-down negative height too), reassembled in output
    * order with string_agg. Emits CTEs ending in
    * `bmpresized(key, out_w, out_h, out_len, outhex)` — invalid keys have
    * no row (callers LEFT JOIN).
    */
  /** The `Multimodal.decodeBmp24` gate over `src(key, h, n)` as CTEs ending
    * in `bmpok(key, h, w, hh, topdown, off, stride)` — one row per complete
    * uncompressed 24bpp BMP, bounds in lockstep with the JVM decode (change
    * them together). Shared by the resample and dHash replays.
    */
  def bmp24GateCtes(src: String): String =
    s"""bmphdr AS (
       |  SELECT key, h, n, ${le32s("h", 18)} AS w, ${le32s("h", 22)} AS hraw,
       |    ${le32s("h", 10)} AS off, ${le16("h", 26)} AS planes,
       |    ${le16("h", 28)} AS bits, ${le32s("h", 30)} AS comp
       |  FROM $src
       |  WHERE n >= 54 AND substr(h, 1, 4) = '424D' AND ${le32s("h", 14)} >= 40),
       |bmpok AS (
       |  SELECT key, h, w, abs(hraw) AS hh, (hraw < 0) AS topdown, off,
       |    ((w*3 + 3) // 4) * 4 AS stride
       |  FROM bmphdr
       |  WHERE w > 0 AND hraw <> 0 AND w <= 65535 AND abs(hraw) <= 65535
       |    AND planes = 1 AND bits = 24 AND comp = 0
       |    AND off >= 54 AND off + ((w*3 + 3) // 4) * 4 * abs(hraw) <= n)""".stripMargin

  def bmpResizeCtes(src: String, maxW: Int, maxH: Int): String = {
    val (ow, oh, _) = graft.operators.Multimodal.resizeFitSql("w", "hh", maxW, maxH)
    s"""${bmp24GateCtes(src)},
       |bmpgeom AS (
       |  SELECT key, h, w, hh, topdown, off, stride,
       |    CAST($ow AS INTEGER) AS out_w, CAST($oh AS INTEGER) AS out_h
       |  FROM bmpok),
       |bmpmap AS (
       |  SELECT key, i,
       |    substr(h,
       |      (off
       |       + (CASE WHEN topdown THEN ((i // out_w) * hh) // out_h
       |               ELSE hh - 1 - (((i // out_w) * hh) // out_h) END) * stride
       |       + (((i % out_w) * w) // out_w) * 3) * 2 + 1, 6) AS p
       |  FROM (SELECT *, unnest(range(out_w * out_h)) AS i FROM bmpgeom)),
       |bmphex AS (
       |  SELECT key, string_agg(p, '' ORDER BY i) AS outhex
       |  FROM bmpmap GROUP BY key),
       |bmpresized AS (
       |  SELECT g.key, g.out_w, g.out_h,
       |    CAST(g.out_w * g.out_h * 3 AS BIGINT) AS out_len, x.outhex
       |  FROM bmpgeom g JOIN bmphex x ON x.key = g.key)""".stripMargin
  }

  /** The 64-bit dHash of `graft.plans.DHashKernel` over `src(key, h, n)`
    * replayed as hex arithmetic: the shared BMP24 decode gate, then the
    * 9x8 grid's 72 luma samples via unnest(range(72)) — each grid point
    * (gx, gy) reading source pixel (gx*w DIV 9, gy*h DIV 8) straight from
    * the hex string (bottom-up/top-down rows + stride, BGR byte order,
    * integer luma 299R + 587G + 114B) — and the 64 horizontal gradient
    * bits folded MSB-first into the two 32-bit halves with variable
    * shifts. Emits CTEs ending in `bmpdhash(key, hi, lo)` — undecodable
    * keys have no row (callers LEFT JOIN or inner-join as the quarantine).
    */
  def bmpDHashCtes(src: String): String =
    s"""${bmp24GateCtes(src)},
       |dgrid AS (
       |  SELECT key, gx, gy,
       |    299 * ${byteAt("h", "base+2")} + 587 * ${byteAt("h", "base+1")}
       |      + 114 * ${byteAt("h", "base")} AS luma
       |  FROM (
       |    SELECT key, h, gx, gy,
       |      off + (CASE WHEN topdown THEN (gy * hh) // 8
       |                  ELSE hh - 1 - ((gy * hh) // 8) END) * stride
       |          + ((gx * w) // 9) * 3 AS base
       |    FROM (SELECT *, g % 9 AS gx, g // 9 AS gy
       |          FROM bmpok, unnest(range(72)) AS t(g)))),
       |dbits AS (
       |  SELECT l.key, l.gy * 8 + l.gx AS idx,
       |    CASE WHEN l.luma > r.luma THEN 1 ELSE 0 END AS bit
       |  FROM dgrid l JOIN dgrid r ON r.key = l.key AND r.gy = l.gy
       |    AND r.gx = l.gx + 1
       |  WHERE l.gx < 8),
       |bmpdhash AS (
       |  SELECT key,
       |    CAST(SUM(CASE WHEN idx < 32
       |      THEN CAST(bit AS BIGINT) << (31 - idx) ELSE 0 END) AS BIGINT) AS hi,
       |    CAST(SUM(CASE WHEN idx >= 32
       |      THEN CAST(bit AS BIGINT) << (63 - idx) ELSE 0 END) AS BIGINT) AS lo
       |  FROM dbits GROUP BY key)""".stripMargin

  /** The EXIF orientation walk of `graft.plans.ExifHeaders` over
    * `src(key, h, n)`: the JPEG marker scan latching the first APP1 whose
    * body opens "Exif\0\0" fully readable (eb = TIFF base, ee = segment
    * end), then the TIFF IFD0 walk of `tiffCtes` on the SLICED hex with
    * tag 274 restricted to SHORT entries, folded with MAX exactly like the
    * parser's fold (an odd-typed duplicate becomes -1 and can't erase a
    * valid value). Emits CTEs ending in `exifori(key, orientation)` —
    * absent/undecodable keys simply have no row.
    */
  def exifCtes(src: String): String = {
    val b = (p: String) => byteAt("h", p)
    def u16(pos: String) =
      s"(CASE WHEN le THEN ${le16("h", pos)} ELSE ${be16("h", pos)} END)"
    def u32(pos: String) =
      s"(CASE WHEN le THEN ${le32u("h", pos)} ELSE ${be32u("h", pos)} END)"
    s"""escan AS (
       |  SELECT key, h, n, 2 AS pos, CAST(NULL AS BIGINT) AS eb,
       |    CAST(NULL AS BIGINT) AS ee
       |  FROM $src WHERE n >= 4 AND substr(h,1,6) = 'FFD8FF'
       |  UNION ALL
       |  SELECT key, h, n,
       |    CASE WHEN found THEN pos
       |         WHEN marker = 255 THEN pos + 1
       |         WHEN marker = 1 OR (marker BETWEEN 208 AND 216) THEN pos + 2
       |         ELSE pos + 2 + seglen END AS pos,
       |    CASE WHEN found THEN pos + 10 END AS eb,
       |    CASE WHEN found THEN pos + 2 + seglen END AS ee
       |  FROM (
       |    SELECT key, h, n, pos, marker, seglen,
       |      marker = 225 AND seglen >= 16 AND pos + 2 + seglen <= n
       |        AND substr(h, 2*(pos+4)+1, 12) = '457869660000' AS found
       |    FROM (
       |      SELECT key, h, n, pos, ${b("pos+1")} AS marker,
       |        ${be16("h", "pos+2")} AS seglen
       |      FROM escan
       |      WHERE eb IS NULL AND pos + 3 < n AND ${b("pos")} = 255))
       |  WHERE marker = 255 OR marker = 1 OR (marker BETWEEN 208 AND 216)
       |     OR (marker NOT IN (217, 218) AND seglen >= 2)
       |),
       |exifsrc AS (
       |  SELECT key, substr(h, 2*eb+1, 2*(ee-eb)) AS h, ee - eb AS n
       |  FROM escan WHERE eb IS NOT NULL),
       |etiff0 AS (
       |  SELECT key, h, n, substr(h,1,8) = '49492A00' AS le,
       |    CASE WHEN substr(h,1,8) = '49492A00' THEN ${le32u("h", "4")}
       |         ELSE ${be32u("h", "4")} END AS ifd
       |  FROM exifsrc
       |  WHERE n >= 8 AND substr(h,1,8) IN ('49492A00','4D4D002A')),
       |etiff1 AS (
       |  SELECT key, h, n, le, ifd, ${u16("ifd")} AS cnt
       |  FROM etiff0 WHERE ifd >= 8 AND ifd + 2 <= n),
       |etiffent AS (
       |  SELECT key, h, le, ifd + 2 + 12*i AS e
       |  FROM (SELECT key, h, le, ifd, unnest(range(cnt)) AS i
       |        FROM etiff1 WHERE ifd + 2 + 12*cnt <= n)),
       |exifori AS (
       |  SELECT key, CAST(orientation AS INTEGER) AS orientation FROM (
       |    SELECT key,
       |      MAX(CASE WHEN ${u16("e")} = 274 THEN
       |        (CASE WHEN ${u16("e+2")} = 3 THEN ${u16("e+8")} ELSE -1 END)
       |      END) AS orientation
       |    FROM etiffent GROUP BY key)
       |  WHERE orientation >= 0)""".stripMargin
  }
}
