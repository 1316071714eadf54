package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.util.Tables

/** Multimodal plumbing: binary payload metadata with REAL container
  * dimension decode (`graft.plans.ImageHeaders` — pure-JVM PNG/JPEG/GIF/BMP
  * header parse), frame sampling, and batched feature extraction. mm03 runs
  * the parser over committed real image bytes (fixtures rendered by
  * `graft.tools.GenImageFixtures` with the JDK's own encoders); the oracle
  * mirrors the byte-level decision procedure in DuckDB SQL (MediaSql).
  */
object MultimodalQueries {

  /** Committed image-fixture parquet as an absolute filesystem path (both
    * Spark and the DuckDB oracle need a real file). Resolution order:
    * unpacked classpath resource (test runs); else walk up from the code
    * source to the sbt build root (sbt bgRun repackages resources into a
    * jar under `<root>/target/bg-jobs`, so the jar location anchors the
    * repo); else the CWD-relative source path.
    */
  def fixturePath(file: String): String = {
    import java.nio.file.{Files, Paths}
    val rel = s"graft/fixtures/$file"
    val url = getClass.getResource("/" + rel)
    val fromClasspath = Option(url).filter(_.getProtocol == "file")
      .map(u => Paths.get(u.toURI))
    val fromCodeSource = fromClasspath.orElse {
      val start = Paths.get(
        getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
      Iterator.iterate(start)(_.getParent).takeWhile(_ != null)
        .find(p => Files.exists(p.resolve("build.sbt")))
        .map(_.resolve("src/main/resources/" + rel))
        .filter(Files.exists(_))
    }
    val path = fromCodeSource.getOrElse(
      Paths.get("src/main/resources/" + rel).toAbsolutePath)
    require(Files.exists(path), s"fixture missing: $path")
    path.toString
  }

  lazy val imageFixturePath: String = fixturePath("images.parquet")
  lazy val bmpFixturePath: String = fixturePath("images_bmp24.parquet")
  lazy val dhashFixturePath: String = fixturePath("images_dhash.parquet")
  lazy val webpFixturePath: String = fixturePath("images_webp.parquet")
  lazy val tiffFixturePath: String = fixturePath("images_tiff.parquet")
  lazy val audioFixturePath: String = fixturePath("audio.parquet")
  lazy val audioFpFixturePath: String = fixturePath("audio_fp.parquet")
  lazy val videoFixturePath: String = fixturePath("video.parquet")
  lazy val flacFixturePath: String = fixturePath("flac.parquet")
  lazy val mp3FixturePath: String = fixturePath("audio_mp3.parquet")
  lazy val exifFixturePath: String = fixturePath("images_exif.parquet")
  lazy val xmodalFixturePath: String = fixturePath("pairs_xmodal.parquet")

  val all: Seq[Q] = Seq(
    // Binary metadata extraction over arbitrary payloads: byte length,
    // content hash, and the real header parse (text payloads are valid
    // UTF-8, so PNG/JPEG magics cannot occur — only the ASCII-magic GIF/BMP
    // branches are even reachable, and the oracle mirrors them exactly).
    Q("mm01_media_meta",
      (s, dir) => {
        val t = Tables(s, dir)
        val withBin = t.documents.withColumn("payload", col("text").cast("binary"))
        Multimodal.withMediaMeta(withBin, "payload")
          .select(col("doc_id"),
            col("media_meta.byte_len").as("byte_len"),
            col("media_meta.content_hash").as("content_hash"),
            col("media_meta.format").as("format"),
            col("media_meta.width").as("width"),
            col("media_meta.height").as("height"))
      },
      Some(s"""WITH b AS (
             |  SELECT doc_id, text, hex(encode(text)) AS h,
             |    octet_length(encode(text)) AS n
             |  FROM documents),
             |src AS (SELECT doc_id AS key, h, n FROM b),
             |${MediaSql.dimsCtes("src", includeJpeg = false)}
             |SELECT b.doc_id, CAST(b.n AS BIGINT) AS byte_len,
             |  md5(b.text) AS content_hash, d.format AS format,
             |  CAST(d.w AS INTEGER) AS width, CAST(d.h_px AS INTEGER) AS height
             |FROM b LEFT JOIN alldims d ON d.key = b.doc_id""".stripMargin)),

    // Real image decode over committed fixture bytes: every format branch
    // (PNG IHDR, JPEG SOF scan incl. a truncated file, GIF, both BMP DIB
    // header generations) plus must-be-null payloads, hash-checked against
    // the DuckDB mirror of the same byte arithmetic.
    Q("mm03_image_dims",
      (s, _) => {
        val imgs = s.read.parquet(imageFixturePath)
        Multimodal.withMediaMeta(imgs, "payload")
          .select(col("name"),
            col("media_meta.byte_len").as("byte_len"),
            // DuckDB md5 only takes VARCHAR — hash the (identical,
            // uppercase-hex) encoding in both engines
            md5(hex(col("payload"))).as("content_hash"),
            col("media_meta.format").as("format"),
            col("media_meta.width").as("width"),
            col("media_meta.height").as("height"))
      },
      Some(s"""WITH RECURSIVE imgs AS (
             |  SELECT name, payload, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$imageFixturePath')),
             |src AS (SELECT name AS key, h, n FROM imgs),
             |${MediaSql.dimsCtes("src")}
             |SELECT i.name, CAST(i.n AS BIGINT) AS byte_len,
             |  md5(i.h) AS content_hash, d.format AS format,
             |  CAST(d.w AS INTEGER) AS width, CAST(d.h_px AS INTEGER) AS height
             |FROM imgs i LEFT JOIN alldims d ON d.key = i.name""".stripMargin)),

    // Aspect-preserving resize PLAN over the real decoded dims (the
    // geometry half of image resize — the pixel half is mm12's batched
    // resizeBmp24Nearest path): fit-within-64x48, never
    // upscale, cross-multiplied integer bound test and DIV-floored
    // scaled edges so both engines agree exactly; unrecognized bytes
    // pass through with null targets. Oracle reuses mm03's dims CTEs.
    Q("mm11_resize_plan",
      (s, _) => {
        val imgs = s.read.parquet(imageFixturePath)
        Multimodal.resizeFit(imgs, "payload", maxW = 64, maxH = 48)
          .select(col("name"),
            col("media_meta.width").as("width"),
            col("media_meta.height").as("height"),
            col("out_w"), col("out_h"), col("scaled"))
      },
      Some {
        val (ow, oh, sc) = graft.operators.Multimodal
          .resizeFitSql("d.w", "d.h_px", 64, 48)
        s"""WITH RECURSIVE imgs AS (
           |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
           |  FROM read_parquet('$imageFixturePath')),
           |src AS (SELECT name AS key, h, n FROM imgs),
           |${MediaSql.dimsCtes("src")}
           |SELECT i.name, CAST(d.w AS INTEGER) AS width,
           |  CAST(d.h_px AS INTEGER) AS height,
           |  CAST($ow AS INTEGER) AS out_w, CAST($oh AS INTEGER) AS out_h,
           |  $sc AS scaled
           |FROM imgs i LEFT JOIN alldims d ON d.key = i.name""".stripMargin
      }),

    // REAL pixel output, hash-checked: nearest-neighbor aspect-fit
    // resample of committed uncompressed 24bpp BMPs (bottom-up AND
    // top-down rows, padded strides, a V5 header), batched through the
    // same mapPartitions inference boundary as extractFeatures. The
    // resampled BGR bytes are pure integer arithmetic, so the oracle
    // replays every output pixel's source pick in hex SQL and the HASH of
    // the bytes must match — the pixel half of mm11's geometry, no stub.
    // Negatives (32bpp, RLE, truncated pixel array, OS/2 core header,
    // noise) must be null in BOTH engines.
    Q("mm12_resize_pixels",
      (s, _) => {
        import s.implicits._
        val imgs = s.read.parquet(bmpFixturePath)
          .select(col("name"), col("payload")).as[(String, Array[Byte])]
        Multimodal.resizeBmp24Nearest(imgs, maxW = 16, maxH = 12, batchSize = 64)
          .toDF()
          .select(col("name"), col("out_w"), col("out_h"),
            length(col("resized")).cast("long").as("out_len"),
            md5(hex(col("resized"))).as("resized_hash"))
      },
      Some(s"""WITH imgs AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$bmpFixturePath')),
             |src AS (SELECT name AS key, h, n FROM imgs),
             |${MediaSql.bmpResizeCtes("src", 16, 12)}
             |SELECT i.name, r.out_w, r.out_h, r.out_len,
             |  md5(r.outhex) AS resized_hash
             |FROM imgs i LEFT JOIN bmpresized r ON r.key = i.name""".stripMargin)),

    // 64-bit perceptual dHash over REAL decoded pixels (plans.DHashBmp —
    // codegen Expression, no stub): 9x8 nearest-sampled integer-luma grid,
    // horizontal gradient signs, carried as two 32-bit halves. The fixture
    // set plants every invariance class (top-down re-encode, 2x nearest
    // upscale, brightness shift — all provably/measurably hash-equal — and
    // a one-grid-cell logo overlay at Hamming 2); negatives (32bpp,
    // noise) must be null in BOTH engines. The oracle replays every grid
    // sample's luma and the 64-bit fold in hex SQL. d25 feeds this hash
    // to the banded Hamming near-dup join — image-level dedup.
    Q("mm14_image_dhash",
      (s, _) => {
        val imgs = s.read.parquet(dhashFixturePath)
        imgs.select(col("name"), graft.plans.DHashBmp(col("payload")).as("dh"))
          .select(col("name"),
            col("dh.hi").as("dhash_hi"), col("dh.lo").as("dhash_lo"))
      },
      Some(s"""WITH imgs AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$dhashFixturePath')),
             |src AS (SELECT name AS key, h, n FROM imgs),
             |${MediaSql.bmpDHashCtes("src")}
             |SELECT i.name, d.hi AS dhash_hi, d.lo AS dhash_lo
             |FROM imgs i LEFT JOIN bmpdhash d ON d.key = i.name""".stripMargin)),

    // The multimodal PREP FUNNEL (t24's image twin): full-decode
    // quarantine → aspect-fit geometry → perceptual dedup (components
    // over the banded dHash pairs, keep the min-name representative) →
    // deterministic split, ONE terminal label per asset in a single DAG.
    // Per-asset audit rows (name, stage, out_w, out_h) hash-checked; the
    // oracle replays decode, pairs (brute-force ≡ banded, pigeonhole),
    // recursive-closure components, geometry and split.
    Q("mm15_media_prep_funnel",
      (s, _) => graft.operators.PrepPipeline.mediaFunnel(
        s.read.parquet(dhashFixturePath), "name", "payload",
        maxW = 64, maxH = 48, bands = 4, radius = 3,
        trainFrac = 0.6, validFrac = 0.2),
      Some(graft.operators.PrepPipeline.mediaFunnelSql(
        dhashFixturePath, maxW = 64, maxH = 48, bands = 4, radius = 3,
        trainFrac = 0.6, validFrac = 0.2))),

    // REAL audio sample-rate conversion, hash-checked — the audio twin of
    // mm12: nearest-frame PCM16 resample to 6 kHz over the committed WAV
    // fixtures (stereo 44.1k, mono 16k, a LIST-before-fmt chunk layout),
    // batched through the same mapPartitions inference boundary. The
    // output frames are pure integer source picks, so the oracle replays
    // every frame's bytes in hex SQL and the BYTE HASH must match.
    // Negatives (8-bit PCM, no fmt/data chunk, truncated, non-RIFF) must
    // be null in BOTH engines.
    Q("mm13_audio_resample",
      (s, _) => {
        import s.implicits._
        val wavs = s.read.parquet(audioFixturePath)
          .select(col("name"), col("payload")).as[(String, Array[Byte])]
        Multimodal.resampleWavPcm16(wavs, dstRate = 6000, batchSize = 64)
          .toDF()
          .select(col("name"), col("channels"), col("src_rate"),
            col("out_frames"),
            length(col("resampled")).cast("long").as("out_len"),
            md5(hex(col("resampled"))).as("resampled_hash"))
      },
      Some(s"""WITH RECURSIVE wavs AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$audioFixturePath')),
             |src AS (SELECT name AS key, h, n FROM wavs),
             |${MediaSql.wavResampleCtes("src", 6000)}
             |SELECT w.name, r.channels, r.src_rate, r.out_frames, r.out_len,
             |  md5(r.outhex) AS resampled_hash
             |FROM wavs w LEFT JOIN wavresampled r ON r.key = w.name""".stripMargin)),

    // 64-bit energy-delta audio fingerprint (plans.AudioFp — codegen
    // Expression, the acoustic mm14): virtual nearest-frame resample to
    // 6 kHz, 65 time-window |sample| energies, envelope gradient signs
    // as two 32-bit halves. The fixture set plants each invariance class
    // (cross-rate re-encode, stereo remaster, gain change — Hamming 0 —
    // and a one-window dropout at a local envelope max: exactly 2 bits);
    // negatives (8-bit PCM, noise) must be null in BOTH engines. The
    // oracle replays every sample pick and window sum in hex SQL. d26
    // feeds this to the banded Hamming join — audio-level dedup.
    Q("mm16_audio_fingerprint",
      (s, _) => {
        val wavs = s.read.parquet(audioFpFixturePath)
        wavs.select(col("name"),
            graft.plans.AudioFp(col("payload"), dstRate = 6000).as("fp"))
          .select(col("name"),
            col("fp.hi").as("fp_hi"), col("fp.lo").as("fp_lo"))
      },
      Some(s"""WITH RECURSIVE wavs AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$audioFpFixturePath')),
             |src AS (SELECT name AS key, h, n FROM wavs),
             |${MediaSql.wavFpCtes("src", 6000)}
             |SELECT w.name, f.hi AS fp_hi, f.lo AS fp_lo
             |FROM wavs w LEFT JOIN wavfp f ON f.key = w.name""".stripMargin)),

    // CROSS-MODAL pair dedup — the multimodal-training rule neither
    // side's dedup implements alone: an (image, caption) pair is
    // redundant only when BOTH sides near-duplicate another pair's.
    // Perceptual image clusters (banded dHash components, exact for
    // radius < bands) × caption clusters (banded-MinHash components)
    // define the CELL; keep the min-pair_id pair per cell. The fixture
    // plants all four quadrants: same-image+same-caption (dropped),
    // same-image+new-caption (kept), new-image+same-caption (kept),
    // undecodable image (quarantined, clusters nulled). The oracle
    // replays dHash decode + brute-force Hamming + recursive closure on
    // the image side and the mirrored MinHash bands + closure on the
    // caption side, then the same cell-min rule.
    Q("mm17_cross_modal_pair_dedup",
      (s, _) => graft.operators.PrepPipeline.crossModalDedup(
        s.read.parquet(xmodalFixturePath),
        "pair_id", "img_name", "payload", "caption",
        bands = 4, radius = 3, n = 3, numHashes = 12, rowsPerBand = 3,
        threshold = 0.8),
      Some(graft.operators.PrepPipeline.crossModalDedupSql(
        xmodalFixturePath, bands = 4, radius = 3, n = 3, numHashes = 12,
        rowsPerBand = 3, threshold = 0.8))),

    // WebP coverage for the same Expression: all three bitstream flavors
    // (VP8X extended 24-bit canvas, "VP8 " lossy 14-bit + sync check, VP8L
    // lossless packed 14-bit fields) over committed hand-built RIFF bytes,
    // plus negatives (bad sync, truncated VP8X, unknown first chunk, a
    // RIFF that is not WEBP) that must be null in BOTH engines.
    Q("mm06_webp_dims",
      (s, _) => {
        val imgs = s.read.parquet(webpFixturePath)
        Multimodal.withMediaMeta(imgs, "payload")
          .select(col("name"),
            col("media_meta.byte_len").as("byte_len"),
            md5(hex(col("payload"))).as("content_hash"),
            col("media_meta.format").as("format"),
            col("media_meta.width").as("width"),
            col("media_meta.height").as("height"))
      },
      Some(s"""WITH imgs AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$webpFixturePath')),
             |src AS (SELECT name AS key, h, n FROM imgs),
             |${MediaSql.webpCtes("src")}
             |SELECT i.name, CAST(i.n AS BIGINT) AS byte_len,
             |  md5(i.h) AS content_hash, d.format AS format,
             |  CAST(d.w AS INTEGER) AS width, CAST(d.h_px AS INTEGER) AS height
             |FROM imgs i LEFT JOIN webpdims d ON d.key = i.name""".stripMargin)),

    // Real TIFF decode over committed hand-assembled bytes: BOTH byte
    // orders (the format's endianness lives in its magic), SHORT and LONG
    // dimension tags, an IFD displaced past padding; negatives (truncated
    // entry table, missing ImageLength, noise) must be null in BOTH
    // engines. The oracle expands the IFD with unnest(range(cnt)) — no
    // recursion needed since the entry count is declared up front.
    Q("mm08_tiff_dims",
      (s, _) => {
        val imgs = s.read.parquet(tiffFixturePath)
        Multimodal.withMediaMeta(imgs, "payload")
          .select(col("name"),
            col("media_meta.byte_len").as("byte_len"),
            md5(hex(col("payload"))).as("content_hash"),
            col("media_meta.format").as("format"),
            col("media_meta.width").as("width"),
            col("media_meta.height").as("height"))
      },
      Some(s"""WITH imgs AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$tiffFixturePath')),
             |src AS (SELECT name AS key, h, n FROM imgs),
             |${MediaSql.tiffCtes("src")}
             |SELECT i.name, CAST(i.n AS BIGINT) AS byte_len,
             |  md5(i.h) AS content_hash, d.format AS format,
             |  CAST(d.w AS INTEGER) AS width, CAST(d.h_px AS INTEGER) AS height
             |FROM imgs i LEFT JOIN tiffdims d ON d.key = i.name""".stripMargin)),

    // Real MP3 decode over committed hand-assembled frame headers: every
    // version family (MPEG1/2/2.5) and layer (I/II/III), an ID3v2-prefixed
    // file exercising the SYNCSAFE tag-size skip, mono vs stereo; free
    // bitrate, reserved sample rate, bad sync, tag-past-EOF and noise must
    // all be null in BOTH engines. The oracle's bitrate/sample-rate CASE
    // chains are generated from the parser's own lookup tables.
    Q("mm09_mp3_meta",
      (s, _) => {
        val mp3s = s.read.parquet(mp3FixturePath)
        Multimodal.withMp3Meta(mp3s, "payload")
          .select(col("name"),
            col("mp3_meta.format").as("format"),
            col("mp3_meta.version").as("version"),
            col("mp3_meta.layer").as("layer"),
            col("mp3_meta.bitrate_kbps").as("bitrate_kbps"),
            col("mp3_meta.sample_rate").as("sample_rate"),
            col("mp3_meta.channels").as("channels"))
      },
      Some(s"""WITH mp3s AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$mp3FixturePath')),
             |src AS (SELECT name AS key, h, n FROM mp3s),
             |${MediaSql.mp3Ctes("src")}
             |SELECT m.name, d.format, d.version, d.layer, d.bitrate_kbps,
             |  d.sample_rate, d.channels
             |FROM mp3s m LEFT JOIN mp3meta d ON d.key = m.name""".stripMargin)),

    // EXIF orientation (tag 0x0112) from committed hand-assembled JPEGs:
    // the marker walk latches the first APP1 opening "Exif\0\0", then the
    // embedded TIFF IFD0 is walked in ITS OWN byte order for the SHORT
    // orientation value — the rotation-normalize signal an image pipeline
    // reads before any pixel work. Negatives (non-Exif APP1 only, wrong
    // value type, truncated segment/IFD, missing tag) are null in BOTH
    // engines.
    Q("mm10_jpeg_exif",
      (s, _) => {
        val imgs = s.read.parquet(exifFixturePath)
        imgs.select(col("name"),
          md5(hex(col("payload"))).as("content_hash"),
          graft.plans.ExifOrientation(col("payload")).as("orientation"))
      },
      Some(s"""WITH RECURSIVE imgs AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$exifFixturePath')),
             |src AS (SELECT name AS key, h, n FROM imgs),
             |${MediaSql.exifCtes("src")}
             |SELECT i.name, md5(i.h) AS content_hash, o.orientation
             |FROM imgs i LEFT JOIN exifori o ON o.key = i.name""".stripMargin)),

    // Real audio decode over committed hand-built RIFF/WAVE bytes: the
    // chunk walk (LIST/junk chunks skipped, pad bytes honored) latches
    // fmt/data, yielding channels/rate/bits/duration; negatives (fmt-less
    // RIFF, truncation, noise) must be null in BOTH engines.
    Q("mm04_audio_meta",
      (s, _) => {
        val wavs = s.read.parquet(audioFixturePath)
        Multimodal.withAudioMeta(wavs, "payload")
          .select(col("name"),
            col("audio_meta.format").as("format"),
            col("audio_meta.channels").as("channels"),
            col("audio_meta.sample_rate").as("sample_rate"),
            col("audio_meta.bits").as("bits"),
            col("audio_meta.data_bytes").as("data_bytes"),
            col("audio_meta.duration_ms").as("duration_ms"))
      },
      Some(s"""WITH RECURSIVE wavs AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$audioFixturePath')),
             |src AS (SELECT name AS key, h, n FROM wavs),
             |${MediaSql.wavCtes("src")}
             |SELECT w.name, m.format, m.channels, m.sample_rate, m.bits,
             |  CAST(m.data_bytes AS BIGINT) AS data_bytes,
             |  CASE WHEN m.sample_rate * m.channels * (m.bits // 8) > 0
             |       THEN CAST(m.data_bytes * 1000 AS DOUBLE) /
             |            CAST(m.sample_rate * m.channels * (m.bits // 8) AS DOUBLE)
             |  END AS duration_ms
             |FROM wavs w LEFT JOIN wavmeta m ON m.key = w.name""".stripMargin)),

    // Real video (MP4/ISO-BMFF) metadata over committed hand-built boxes:
    // top-level walk to moov (free/largesize/size-0 boxes honored), child
    // walk to mvhd, version-0/1 timescale+duration; negatives null in BOTH
    // engines.
    Q("mm05_video_meta",
      (s, _) => {
        val vids = s.read.parquet(videoFixturePath)
        Multimodal.withVideoMeta(vids, "payload")
          .select(col("name"),
            col("video_meta.format").as("format"),
            col("video_meta.timescale").as("timescale"),
            col("video_meta.duration").as("duration"),
            col("video_meta.duration_ms").as("duration_ms"))
      },
      Some(s"""WITH RECURSIVE vids AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('$videoFixturePath')),
             |src AS (SELECT name AS key, h, n FROM vids),
             |${MediaSql.mp4Ctes("src")}
             |SELECT v.name, m.format,
             |  CAST(m.timescale AS BIGINT) AS timescale,
             |  CAST(m.duration AS BIGINT) AS duration,
             |  CASE WHEN m.timescale > 0
             |       THEN CAST(m.duration * 1000 AS DOUBLE) / CAST(m.timescale AS DOUBLE)
             |  END AS duration_ms
             |FROM vids v LEFT JOIN mp4meta m ON m.key = v.name""".stripMargin)),

    // Frame sampling: 16-byte frames, every 4th frame, per-frame hash.
    Q("mm02_frame_sample",
      (s, dir) => {
        val t = Tables(s, dir)
        val withBin = t.documents.withColumn("payload", col("text").cast("binary"))
        Multimodal.sampleFrames(withBin, "doc_id", "payload", frameBytes = 16, stride = 4)
      },
      Some("""WITH f AS (
             |  SELECT doc_id AS id,
             |    unnest(range(0, GREATEST(CAST(ceil(octet_length(encode(text)) / 16.0) AS INTEGER), 1))) AS frame_idx,
             |    text
             |  FROM documents)
             |SELECT id, CAST(frame_idx AS BIGINT) AS frame_idx,
             |  md5(substr(text, frame_idx * 16 + 1, 16)) AS frame_hash
             |FROM f WHERE frame_idx % 4 = 0""".stripMargin)),

    // FLAC STREAMINFO bit-unpack (plans.FlacMeta): the lossless-audio
    // sibling of mm04 — sample rate (20 bits), channels (3), bit depth
    // (5) and total samples (36) all live packed in the mandatory first
    // metadata block, so duration comes from the header alone, no data
    // scan. Fixtures exercise every bit boundary (sub-nibble rates, 8
    // channels, a 36-bit sample count) plus the null paths; the oracle
    // re-derives each field with hex-nibble arithmetic.
    Q("mm07_flac_meta",
      (s, _) => {
        val flacs = s.read.parquet(flacFixturePath)
        Multimodal.withFlacMeta(flacs, "payload")
          .select(col("name"),
            col("flac_meta.format").as("format"),
            col("flac_meta.sample_rate").as("sample_rate"),
            col("flac_meta.channels").as("channels"),
            col("flac_meta.bits").as("bits"),
            col("flac_meta.total_samples").as("total_samples"),
            col("flac_meta.duration_ms").as("duration_ms"))
      },
      Some {
        val b = (i: Int) => MediaSql.byteAt("h", i)
        val sr = s"(${b(18)}*4096 + ${b(19)}*16 + ${b(20)}//16)"
        val ch = s"((${b(20)}//2) % 8 + 1)"
        val bps = s"((${b(20)} % 2)*16 + ${b(21)}//16 + 1)"
        val total = s"((${b(21)} % 16)*4294967296 + ${MediaSql.be32("h", 22)})"
        s"""WITH flacs AS (
           |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
           |  FROM read_parquet('$flacFixturePath')),
           |parsed AS (
           |  SELECT name,
           |    (n >= 42 AND substr(h, 1, 8) = '664C6143'
           |     AND ${b(4)} % 128 = 0
           |     AND (${b(5)}*65536 + ${b(6)}*256 + ${b(7)}) >= 34) AS ok,
           |    $sr AS sr, $ch AS ch, $bps AS bps, $total AS total
           |  FROM flacs)
           |SELECT name,
           |  CASE WHEN ok THEN 'flac' END AS format,
           |  CASE WHEN ok THEN CAST(sr AS BIGINT) END AS sample_rate,
           |  CASE WHEN ok THEN ch END AS channels,
           |  CASE WHEN ok THEN bps END AS bits,
           |  CASE WHEN ok THEN CAST(total AS BIGINT) END AS total_samples,
           |  CASE WHEN ok AND sr > 0
           |       THEN CAST(total * 1000 AS DOUBLE) / CAST(sr AS DOUBLE)
           |  END AS duration_ms
           |FROM parsed""".stripMargin
      }),
  )
}
