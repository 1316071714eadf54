package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in batch-shaped passes.
  *
  * Dimension decode is a REAL pure-JVM header parse (PNG IHDR / JPEG SOF
  * scan / GIF / BMP — `graft.plans.ImageHeaders`, byte arithmetic only, no
  * codec library). Full pixel decode and model inference remain external by
  * nature; `extractFeatures`' embed kernel is a clearly-marked deterministic
  * stand-in at the exact boundary a production model call would occupy.
  *
  * Scale notes: `withMediaMeta` is pure narrow column work (codegen'd, no
  * shuffle). `extractFeatures` uses mapPartitions with explicit micro-batches
  * — the Scala analog of a vectorized/batched inference UDF: the model (stub)
  * is invoked once per batch, not per row, and partition size controls the
  * batch shape. Frame sampling explodes to (item, frame) grain; at 100 TB
  * repartition on item id first so frames of one item stay together.
  */
object Multimodal {

  /** Typed metadata extracted from a binary media column: exact byte stats
    * plus real container dimensions (null format/width/height when the bytes
    * are not a recognized PNG/JPEG/GIF/BMP header).
    */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame = {
    val dims = graft.plans.ImageDims(col(binCol))
    df.withColumn("media_meta", struct(
      length(col(binCol)).cast("long").as("byte_len"),
      md5(col(binCol)).as("content_hash"),
      dims.getField("format").as("format"),
      dims.getField("width").as("width"),
      dims.getField("height").as("height")))
  }

  /** Typed audio metadata from a binary column: real WAV/RIFF header parse
    * (channels / sample rate / bits / data bytes; null for non-WAV) plus a
    * derived duration_ms — exact integer arithmetic so both engines agree.
    */
  def withAudioMeta(df: DataFrame, binCol: String): DataFrame = {
    val wav = graft.plans.AudioMeta(col(binCol))
    // exact-int byte rate: sample_rate * channels * (bits DIV 8)
    val bytesPerSec = wav.getField("sample_rate") *
      wav.getField("channels").cast("long") *
      floor(wav.getField("bits").cast("double") / 8.0).cast("long")
    df.withColumn("audio_meta", struct(
      wav.getField("format").as("format"),
      wav.getField("channels").as("channels"),
      wav.getField("sample_rate").as("sample_rate"),
      wav.getField("bits").as("bits"),
      wav.getField("data_bytes").as("data_bytes"),
      // deterministic double division of exact ints, mirrored in the oracle
      when(bytesPerSec > 0,
        (wav.getField("data_bytes") * 1000L).cast("double") /
          bytesPerSec.cast("double")).as("duration_ms")))
  }

  /** Typed FLAC metadata from a binary column: real STREAMINFO bit-unpack
    * (graft.plans.FlacMeta; null for non-FLAC) plus derived duration_ms —
    * total_samples is in the header, so duration needs no data scan.
    */
  def withFlacMeta(df: DataFrame, binCol: String): DataFrame = {
    val f = graft.plans.FlacMeta(col(binCol))
    df.withColumn("flac_meta", struct(
      f.getField("format").as("format"),
      f.getField("sample_rate").as("sample_rate"),
      f.getField("channels").as("channels"),
      f.getField("bits").as("bits"),
      f.getField("total_samples").as("total_samples"),
      when(f.getField("sample_rate") > 0,
        (f.getField("total_samples") * 1000L).cast("double") /
          f.getField("sample_rate").cast("double")).as("duration_ms")))
  }

  /** Typed MP3 metadata from a binary column: real frame-header decode
    * past an optional ID3v2 tag (graft.plans.Mp3Meta; null for non-MP3) —
    * version family, layer, bitrate, sample rate, channel count.
    */
  def withMp3Meta(df: DataFrame, binCol: String): DataFrame = {
    val m = graft.plans.Mp3Meta(col(binCol))
    df.withColumn("mp3_meta", struct(
      m.getField("format").as("format"),
      m.getField("version").as("version"),
      m.getField("layer").as("layer"),
      m.getField("bitrate_kbps").as("bitrate_kbps"),
      m.getField("sample_rate").as("sample_rate"),
      m.getField("channels").as("channels")))
  }

  /** Typed video metadata from a binary column: real MP4/ISO-BMFF box walk
    * (mvhd timescale/duration; null for non-MP4) plus derived duration_ms.
    */
  def withVideoMeta(df: DataFrame, binCol: String): DataFrame = {
    val mp4 = graft.plans.VideoMeta(col(binCol))
    df.withColumn("video_meta", struct(
      mp4.getField("format").as("format"),
      mp4.getField("timescale").as("timescale"),
      mp4.getField("duration").as("duration"),
      when(mp4.getField("timescale") > 0,
        (mp4.getField("duration") * 1000L).cast("double") /
          mp4.getField("timescale").cast("double")).as("duration_ms")))
  }

  /** Aspect-preserving resize PLAN: the target geometry every image
    * pipeline computes before touching a pixel, from the REAL decoded
    * dims (withMediaMeta) in exact integer arithmetic so both engines
    * agree bit-for-bit. Fit-within-(maxW, maxH), never upscale:
    * width-bound iff w·maxH >= h·maxW (cross-multiplied — no float
    * ratios), scaled edge = (other · max) DIV this, floored to >= 1.
    * Unrecognized bytes (null dims) pass through with null targets —
    * the quarantine-not-crash discipline. Adds out_w / out_h / scaled;
    * the pixel resampling itself is [[resizeBmp24Nearest]]'s batched path.
    */
  def resizeFit(df: DataFrame, binCol: String, maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0, s"bad fit box ${maxW}x$maxH")
    val meta = withMediaMeta(df, binCol)
    val w = col("media_meta.width").cast("long")
    val h = col("media_meta.height").cast("long")
    val fits = w <= maxW && h <= maxH
    val widthBound = w * maxH >= h * maxW
    val outW = when(w.isNull || h.isNull, lit(null))
      .when(fits, w)
      .when(widthBound, lit(maxW.toLong))
      .otherwise(greatest(expr(s"(media_meta.width * ${maxH}L) DIV media_meta.height"), lit(1L)))
    val outH = when(w.isNull || h.isNull, lit(null))
      .when(fits, h)
      .when(widthBound,
        greatest(expr(s"(media_meta.height * ${maxW}L) DIV media_meta.width"), lit(1L)))
      .otherwise(lit(maxH.toLong))
    meta
      .withColumn("out_w", outW.cast("int"))
      .withColumn("out_h", outH.cast("int"))
      .withColumn("scaled", when(w.isNull || h.isNull, lit(null)).otherwise(!fits))
  }

  /** Oracle mirror of [[resizeFit]]'s geometry: integer CASE chain over
    * (w, h) SQL expressions — `//` division, cross-multiplied bound test.
    */
  def resizeFitSql(wExpr: String, hExpr: String, maxW: Int, maxH: Int)
      : (String, String, String) = {
    val fits = s"($wExpr <= $maxW AND $hExpr <= $maxH)"
    val wb = s"($wExpr * $maxH >= $hExpr * $maxW)"
    val ow = s"""CASE WHEN $wExpr IS NULL OR $hExpr IS NULL THEN NULL
                | WHEN $fits THEN $wExpr
                | WHEN $wb THEN $maxW
                | ELSE GREATEST(($wExpr * $maxH) // $hExpr, 1) END""".stripMargin
    val oh = s"""CASE WHEN $wExpr IS NULL OR $hExpr IS NULL THEN NULL
                | WHEN $fits THEN $hExpr
                | WHEN $wb THEN GREATEST(($hExpr * $maxW) // $wExpr, 1)
                | ELSE $maxH END""".stripMargin
    val scaled = s"""CASE WHEN $wExpr IS NULL OR $hExpr IS NULL THEN NULL
                    | ELSE NOT $fits END""".stripMargin
    (ow, oh, scaled)
  }

  /** REAL pixel resample for uncompressed 24bpp BMP payloads: pure-JVM
    * header parse (BITMAPINFOHEADER or later, bottom-up or top-down rows,
    * 4-byte row padding honored) + aspect-fit nearest-neighbor resample
    * to fit within maxW×maxH ([[resizeFit]]'s exact integer geometry:
    * never upscale, cross-multiplied bound test, DIV-floored edges).
    * Output is raw BGR24, top-down, unpadded — ow·oh·3 bytes of
    * deterministic integer arithmetic, so the bytes themselves hash-check
    * against a DuckDB replay (MediaSql.bmpResizeCtes). Payloads that are
    * not a complete uncompressed 24bpp BMP quarantine to null fields,
    * never throw.
    *
    * Batched EXACTLY like [[extractFeatures]]: rows stream through
    * mapPartitions in fixed-size groups with one resampler invocation per
    * group — the boundary where a compressed-format codec (JPEG/PNG)
    * would drop in without touching the plan. Scale: narrow pipeline, no
    * shuffle; per-row output is bounded by maxW·maxH·3 bytes regardless
    * of input size, so the stage's memory is batchSize-bounded.
    */
  def resizeBmp24Nearest(ds: Dataset[(String, Array[Byte])], maxW: Int,
      maxH: Int, batchSize: Int): Dataset[BmpResizeRow] = {
    require(maxW > 0 && maxH > 0, s"bad resize target ${maxW}x$maxH")
    implicit val enc: Encoder[BmpResizeRow] = Encoders.product[BmpResizeRow]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "resampler call" per batch — the real inference boundary
        batch.map { case (name, bytes) =>
          decodeBmp24(bytes) match {
            case None => BmpResizeRow(name, None, None, None)
            case Some((w, h, topDown, off)) =>
              val (ow, oh) = fitWithin(w, h, maxW, maxH)
              BmpResizeRow(name, Some(ow), Some(oh),
                Some(resampleNearest(bytes, w, h, topDown, off, ow, oh)))
          }
        }
      }
    }
  }

  /** (width, height, topDown, pixelOffset) for a complete uncompressed
    * 24bpp BMP; None otherwise. Bounds mirror MediaSql.bmpResizeCtes
    * bit for bit — change them in lockstep.
    */
  private[graft] def decodeBmp24(b: Array[Byte]): Option[(Int, Int, Boolean, Int)] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int) = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    if (le32(14) < 40) return None // BITMAPINFOHEADER or later (V4/V5 ok)
    val w = le32(18)
    val hraw = le32(22)
    val topDown = hraw < 0
    val h = math.abs(hraw)
    // 65535-px edge cap: keeps every stride/offset product in range and
    // rejects absurd headers before any allocation
    if (w <= 0 || h == 0 || w > 65535 || h > 65535) return None
    if (le16(26) != 1 || le16(28) != 24 || le32(30) != 0) return None
    val off = le32(10)
    val stride = (w * 3 + 3) / 4 * 4
    if (off < 54 || off.toLong + stride.toLong * h > b.length) return None
    Some((w, h, topDown, off))
  }

  /** [[resizeFit]]'s integer aspect-fit geometry on plain ints. */
  private def fitWithin(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) =
    if (w <= maxW && h <= maxH) (w, h)
    else if (w.toLong * maxH >= h.toLong * maxW)
      (maxW, math.max((h.toLong * maxW / w).toInt, 1))
    else (math.max((w.toLong * maxH / h).toInt, 1), maxH)

  /** Floor-mapped nearest-neighbor: output pixel (ox, oy) reads source
    * (ox·w DIV ow, oy·h DIV oh); BMP rows are bottom-up unless topDown.
    */
  private def resampleNearest(b: Array[Byte], w: Int, h: Int,
      topDown: Boolean, off: Int, ow: Int, oh: Int): Array[Byte] = {
    val stride = (w * 3 + 3) / 4 * 4
    val out = new Array[Byte](ow * oh * 3)
    var oy = 0
    while (oy < oh) {
      val sy = ((oy.toLong * h) / oh).toInt
      val fileRow = if (topDown) sy else h - 1 - sy
      val rowBase = off + fileRow * stride
      var ox = 0
      while (ox < ow) {
        val sx = ((ox.toLong * w) / ow).toInt
        val src = rowBase + sx * 3
        val dst = (oy * ow + ox) * 3
        out(dst) = b(src)
        out(dst + 1) = b(src + 1)
        out(dst + 2) = b(src + 2)
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Batched feature extraction over (id, bytes) pairs — the inference-UDF
    * shape: rows stream through mapPartitions in fixed-size batches and the
    * per-batch "model" (STUB: hash-derived float vector) runs once per batch.
    */
  def extractFeatures(ds: Dataset[(Long, Array[Byte])], dim: Int,
      batchSize: Int): Dataset[(Long, Array[Float])] = {
    implicit val enc: Encoder[(Long, Array[Float])] =
      Encoders.tuple(Encoders.scalaLong, ExprEnc.floatArray)
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "model call" per batch — the real inference boundary
        batch.map { case (id, bytes) => id -> stubEmbed(bytes, dim) }
      }
    }
  }

  /** STUB embedding: deterministic floats from the content bytes. */
  private def stubEmbed(bytes: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    Array.tabulate(dim)(i => ((md(i % md.length) & 0xff) - 128) / 128.0f)
  }

  /** Frame sampling: treat the binary payload as fixed-size frames, keep
    * every `stride`-th frame, emit (id, frame_idx, frame_hash). The slicing
    * is real; a video decoder would replace the fixed-size split.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col(binCol)).cast("double") / frameBytes).cast("int")
    // carry the binary column through the explode — one narrow pass, no
    // join-back (a join would shuffle the full corpus by id for nothing)
    df.select(col(idCol).as("id"), col(binCol).as("_bin"),
        posexplode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .withColumnRenamed("pos", "frame_idx").drop("col")
      .filter(col("frame_idx") % stride === 0)
      .withColumn("frame_hash",
        md5(col("_bin").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))))
      .select(col("id"), col("frame_idx").cast("long").as("frame_idx"), col("frame_hash"))
  }

  /** REAL sample-rate conversion for PCM16 WAV payloads — the audio twin of
    * [[resizeBmp24Nearest]]: pure-JVM RIFF chunk walk (latch-first `fmt `
    * and `data`, word-aligned advance — bit-for-bit the `plans.AudioMeta`
    * walk) + nearest-frame resample to `dstRate`:
    * `outFrames = nFrames·dstRate DIV srcRate`, output frame i copies
    * source frame `i·nFrames DIV outFrames` (all channel bytes — the exact
    * integer mapping the image path uses per axis). Output is raw
    * little-endian interleaved PCM16 with no container, so the bytes
    * hash-check against a DuckDB hex replay (MediaSql.wavResampleCtes).
    * Payloads that are not a complete PCM16 WAV (wrong codec tag, 8-bit,
    * truncated data chunk, no fmt/data, zero output frames) quarantine to
    * null fields, never throw.
    *
    * Batched exactly like [[extractFeatures]]: one "resampler call" per
    * fixed-size mapPartitions group — where a real DSP kernel (windowed
    * sinc) would drop in without touching the plan. Scale: narrow
    * pipeline, no shuffle; per-row output is `dstRate/srcRate`-bounded
    * relative to the input, so stage memory is batchSize-bounded.
    */
  def resampleWavPcm16(ds: Dataset[(String, Array[Byte])], dstRate: Int,
      batchSize: Int): Dataset[WavResampleRow] = {
    require(dstRate > 0, s"dstRate ($dstRate) must be positive")
    implicit val enc: Encoder[WavResampleRow] = Encoders.product[WavResampleRow]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "resampler call" per batch — the real inference boundary
        batch.map { case (name, bytes) =>
          decodeWavPcm16(bytes) match {
            case None => WavResampleRow(name, None, None, None, None)
            case Some((channels, srcRate, dataPos, nFrames)) =>
              val outFramesL = nFrames * dstRate / srcRate
              // zero-output and alloc-overflow quarantine (same null
              // contract as undecodable payloads; mirrored in the oracle)
              if (outFramesL <= 0 || outFramesL * channels * 2 > Int.MaxValue)
                WavResampleRow(name, None, None, None, None)
              else {
                val outFrames = outFramesL.toInt
                WavResampleRow(name, Some(channels), Some(srcRate),
                  Some(outFrames),
                  Some(resampleFrames(bytes, channels, dataPos, nFrames, outFrames)))
              }
          }
        }
      }
    }
  }

  /** (channels, sampleRate, dataPos, nFrames) for a complete PCM16 WAV;
    * None otherwise. The chunk walk and bounds mirror
    * MediaSql.wavResampleCtes bit for bit — change them in lockstep.
    */
  private[graft] def decodeWavPcm16(b: Array[Byte]): Option[(Int, Long, Int, Long)] = {
    def u8(i: Int) = b(i) & 0xff
    def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
    def le32u(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)).toLong & 0xffffffffL
    if (b.length < 12) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    var pos = 12L
    var fmtPos = -1L
    var dataPos = -1L
    var dataBytes = -1L
    while (pos + 8 <= b.length) {
      val p = pos.toInt
      val cid = new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32u(p + 4)
      if (cid == "fmt " && fmtPos < 0 && size >= 16 && pos + 24 <= b.length)
        fmtPos = pos
      if (cid == "data" && dataPos < 0) { dataPos = pos + 8; dataBytes = size }
      pos += 8 + size + (size % 2)
    }
    if (fmtPos < 0 || dataPos < 0) return None
    val f = fmtPos.toInt
    val codec = le16(f + 8)
    val channels = le16(f + 10)
    val rate = le32u(f + 12)
    val bits = le16(f + 22)
    if (codec != 1 || bits != 16 || channels <= 0 || rate <= 0) return None
    if (dataPos + dataBytes > b.length) return None // truncated data chunk
    val nFrames = dataBytes / (channels * 2)
    if (nFrames <= 0) return None
    Some((channels, rate, dataPos.toInt, nFrames))
  }

  /** Nearest-frame copy: output frame i reads source frame
    * (i·nFrames DIV outFrames), all `channels`·2 bytes at once.
    */
  private def resampleFrames(b: Array[Byte], channels: Int, dataPos: Int,
      nFrames: Long, outFrames: Int): Array[Byte] = {
    val frameBytes = channels * 2
    val out = new Array[Byte](outFrames * frameBytes)
    var i = 0
    while (i < outFrames) {
      val src = dataPos + ((i.toLong * nFrames) / outFrames).toInt * frameBytes
      System.arraycopy(b, src, out, i * frameBytes, frameBytes)
      i += 1
    }
    out
  }
}

/** One resampled row: null fields (None) quarantine payloads that are not
  * a complete uncompressed 24bpp BMP — loud schema, never an exception.
  */
final case class BmpResizeRow(name: String, out_w: Option[Int],
    out_h: Option[Int], resized: Option[Array[Byte]])

/** One resampled audio row: null fields quarantine payloads that are not a
  * complete PCM16 WAV (or whose resample would be empty/unallocatable) —
  * loud schema, never an exception.
  */
final case class WavResampleRow(name: String, channels: Option[Int],
    src_rate: Option[Long], out_frames: Option[Int],
    resampled: Option[Array[Byte]])

/** Encoder helper (kept tiny; Encoders.product can't see Array[Float] alone). */
private object ExprEnc {
  val floatArray: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
}
