package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  val media = Seq(
    (1L, "x" * 100),
    (2L, "y" * 33),
  ).toDF("id", "txt").withColumn("payload", col("txt").cast("binary"))

  test("withMediaMeta attaches typed metadata from binary payloads") {
    val m = Multimodal.withMediaMeta(media, "payload")
      .select("id", "media_meta.byte_len", "media_meta.format",
        "media_meta.width", "media_meta.height")
      .orderBy("id").collect()
    assert(m(0).getLong(1) == 100L)
    assert(m(1).getLong(1) == 33L)
    // text payloads are not image headers: format/dims must be null
    assert(m.forall(r => r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4)))
  }

  test("ImageHeaders matches the JDK's own decoder on every format") {
    System.setProperty("java.awt.headless", "true")
    import graft.plans.ImageHeaders
    import graft.tools.GenImageFixtures.{encode, render}
    val sizes = Seq((640, 480), (31, 17), (123, 77), (1, 1), (2048, 3))
    for ((fmt, io) <- Seq(("png", "png"), ("jpeg", "jpg"), ("gif", "gif"), ("bmp", "bmp"));
         (w, h) <- sizes) {
      val bytes = encode(render(w, h, w + h, java.awt.image.BufferedImage.TYPE_INT_RGB), io)
      assert(ImageHeaders.parse(bytes) == Some((fmt, w, h)), s"$fmt $w x $h")
      // independent decode path agrees
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == w && img.getHeight == h)
    }
  }

  test("ImageHeaders handles legacy BMP, truncation, and junk") {
    import graft.plans.ImageHeaders
    import graft.tools.GenImageFixtures
    assert(ImageHeaders.parse(GenImageFixtures.coreHeaderBmp(25, 13)) ==
      Some(("bmp", 25, 13)))
    val fx = GenImageFixtures.fixtures().toMap
    assert(ImageHeaders.parse(fx("not_an_image")).isEmpty)
    assert(ImageHeaders.parse(fx("truncated_jpeg")).isEmpty)
    assert(ImageHeaders.parse(fx("empty")).isEmpty)
  }

  test("committed fixture parquet decodes to the rendered dimensions") {
    val imgs = spark.read.parquet(graft.queries.MultimodalQueries.imageFixturePath)
    val got = Multimodal.withMediaMeta(imgs, "payload")
      .select(col("name"), col("media_meta.format"),
        col("media_meta.width"), col("media_meta.height"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getString(1), r.getInt(2), r.getInt(3)))))
      .toMap
    assert(got("png_640x480") == Some(("png", 640, 480)))
    assert(got("png_31x17") == Some(("png", 31, 17)))
    assert(got("jpeg_640x480") == Some(("jpeg", 640, 480)))
    assert(got("jpeg_123x77") == Some(("jpeg", 123, 77)))
    assert(got("gif_320x200") == Some(("gif", 320, 200)))
    assert(got("bmp_97x53") == Some(("bmp", 97, 53)))
    assert(got("bmp_core_25x13") == Some(("bmp", 25, 13)))
    assert(got("not_an_image").isEmpty && got("truncated_jpeg").isEmpty
      && got("empty").isEmpty)
  }

  test("ImageHeaders parses all three WebP flavors; negatives stay null") {
    val webp = spark.read.parquet(
      graft.queries.MultimodalQueries.webpFixturePath)
    val got = Multimodal.withMediaMeta(webp, "payload")
      .select(col("name"), col("media_meta.format"),
        col("media_meta.width"), col("media_meta.height"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getString(1), r.getInt(2), r.getInt(3)))))
      .toMap
    assert(got("webp_vp8x_400x300") == Some(("webp", 400, 300)))
    assert(got("webp_lossy_176x144") == Some(("webp", 176, 144)))
    assert(got("webp_lossless_33x21") == Some(("webp", 33, 21)))
    assert(got("webp_bad_sync").isEmpty && got("webp_truncated_vp8x").isEmpty
      && got("webp_alien_chunk").isEmpty && got("riff_not_webp").isEmpty)
  }

  test("ImageHeaders parses TIFF in both byte orders; negatives stay null") {
    val got = graft.tools.GenTiffFixtures.fixtures().map { case (name, bytes) =>
      name -> graft.plans.ImageHeaders.parse(bytes)
    }.toMap
    assert(got("tiff_le_long_800x600") == Some(("tiff", 800, 600)))
    assert(got("tiff_le_short_41x29") == Some(("tiff", 41, 29)))
    assert(got("tiff_be_short_320x240") == Some(("tiff", 320, 240)))
    assert(got("tiff_be_long_70000x2") == Some(("tiff", 70000, 2))) // > 16 bit
    assert(got("tiff_displaced_ifd_64x48") == Some(("tiff", 64, 48)))
    assert(got("tiff_truncated_ifd").isEmpty && got("tiff_no_height").isEmpty
      && got("not_a_tiff").isEmpty)
    // committed fixture parquet byte-matches the generator (regeneration
    // guard: the oracle reads the committed file, the engine could read
    // either — they must be the same bytes)
    val committed = spark.read.parquet(
      graft.queries.MultimodalQueries.tiffFixturePath)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val gen = graft.tools.GenTiffFixtures.fixtures().toMap
    assert(committed.keySet == gen.keySet)
    for ((k, v) <- gen)
      assert(java.util.Arrays.equals(committed(k), v), s"fixture $k drifted")
  }

  test("Mp3Headers decodes every family; ID3 skip; negatives stay null") {
    val got = graft.tools.GenMp3Fixtures.fixtures().map { case (name, bytes) =>
      val r = graft.plans.Mp3Headers.parseRow(bytes)
      name -> Option(r).map(x => (x.getUTF8String(1).toString, x.getInt(2),
        x.getInt(3), x.getInt(4), x.getInt(5)))
    }.toMap
    assert(got("mp3_v1l3_128k_44100_stereo") == Some(("mpeg1", 3, 128, 44100, 2)))
    assert(got("mp3_id3_v1l3_192k_48000") == Some(("mpeg1", 3, 192, 48000, 2)))
    assert(got("mp3_v1l1_448k_32000") == Some(("mpeg1", 1, 448, 32000, 2)))
    assert(got("mp3_v1l2_112k_44100") == Some(("mpeg1", 2, 112, 44100, 2)))
    assert(got("mp3_v2l3_64k_22050_mono") == Some(("mpeg2", 3, 64, 22050, 1)))
    assert(got("mp3_v25l3_16k_8000") == Some(("mpeg2.5", 3, 16, 8000, 2)))
    assert(got("mp3_free_bitrate").isEmpty && got("mp3_reserved_samplerate").isEmpty
      && got("mp3_bad_sync").isEmpty && got("mp3_id3_past_eof").isEmpty
      && got("not_audio").isEmpty)
    // committed fixture parquet byte-matches the generator
    val committed = spark.read.parquet(
      graft.queries.MultimodalQueries.mp3FixturePath)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val gen = graft.tools.GenMp3Fixtures.fixtures().toMap
    assert(committed.keySet == gen.keySet)
    for ((k, v) <- gen)
      assert(java.util.Arrays.equals(committed(k), v), s"fixture $k drifted")
  }

  test("resizeFit: both fit branches, never-upscale, exact DIV edges, null quarantine") {
    System.setProperty("java.awt.headless", "true")
    import graft.tools.GenImageFixtures.{encode, render}
    def png(w: Int, h: Int) =
      encode(render(w, h, w + h, java.awt.image.BufferedImage.TYPE_INT_RGB), "png")
    val rows = Seq(
      (1L, png(640, 480)),  // width-bound: exact 64x48
      (2L, png(20, 300)),   // HEIGHT-bound (tall — the branch the committed
                            // fixture lacks): out_h=48, out_w=(20*48)DIV300=3
      (3L, png(1, 2000)),   // extreme aspect: DIV floors to 0 -> clamped to 1
      (4L, png(31, 17)),    // fits: untouched, scaled=false
      (5L, "junk".getBytes) // unrecognized: null targets
    ).toDF("id", "payload")
    val got = Multimodal.resizeFit(rows, "payload", maxW = 64, maxH = 48)
      .select("id", "out_w", "out_h", "scaled")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getBoolean(3)))))
      .toMap
    assert(got(1L) == Some((64, 48, true)))
    assert(got(2L) == Some((3, 48, true)))
    assert(got(3L) == Some((1, 48, true)))
    assert(got(4L) == Some((31, 17, false)))
    assert(got(5L).isEmpty)
  }

  test("resizeBmp24Nearest: real pixels, hand-checked picks, padding/orientation honored") {
    import graft.tools.GenBmpResizeFixtures.{bmp24, px}
    val rows = Seq(
      "down" -> bmp24(4, 4, seed = 1),     // 4x4 -> 2x2 with max 2x2
      "fits" -> bmp24(2, 2, seed = 2),     // identity re-layout (stride 8, 2 pad bytes)
      "td" -> bmp24(4, 4, seed = 1, topDown = true), // same image, top-down storage
      "bad" -> "junk".getBytes("UTF-8"))
    val ds = spark.createDataFrame(rows).toDF("name", "payload")
      .as[(String, Array[Byte])]
    val got = Multimodal.resizeBmp24Nearest(ds, maxW = 2, maxH = 2, batchSize = 16)
      .collect().map(r => r.name -> r).toMap
    // hand-computed nearest picks: out (ox,oy) reads source (ox*4 DIV 2,
    // oy*4 DIV 2) = (2ox, 2oy); output is BGR top-down unpadded
    val expectDown = Array(0, 0, 2, 0, 0, 2, 2, 2).grouped(2).flatMap {
      case Array(x, y) => val (b, g, r) = px(x, y, 1); Seq(b, g, r) }.toArray
    assert(got("down").resized.get.toSeq == expectDown.toSeq)
    // identity copy strips the row padding and flips to top-down order
    val expectFits = (for (y <- 0 until 2; x <- 0 until 2) yield {
      val (b, g, r) = px(x, y, 2); Seq(b, g, r) }).flatten.toArray
    assert(got("fits").resized.get.toSeq == expectFits.toSeq)
    assert(got("fits").out_w == Some(2) && got("fits").out_h == Some(2))
    // top-down storage of the same image must resample to identical bytes
    assert(got("td").resized.get.toSeq == got("down").resized.get.toSeq)
    // invalid payloads quarantine to nulls, never throw
    assert(got("bad").out_w.isEmpty && got("bad").resized.isEmpty)
    // batch size must not change bytes
    val b1 = Multimodal.resizeBmp24Nearest(ds, 2, 2, batchSize = 1)
      .collect().map(r => r.name -> r.resized.map(_.toSeq)).toMap
    assert(rows.map(_._1).forall(k =>
      b1(k) == got(k).resized.map(_.toSeq)))
  }

  test("committed BMP-resize fixture byte-matches its generator") {
    val committed = spark.read.parquet(
      graft.queries.MultimodalQueries.bmpFixturePath)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val gen = graft.tools.GenBmpResizeFixtures.fixtures().toMap
    assert(committed.keySet == gen.keySet)
    for ((k, v) <- gen)
      assert(java.util.Arrays.equals(committed(k), v), s"fixture $k drifted")
  }

  test("extractFeatures runs batched and is deterministic") {
    val ds = media.select(col("id"), col("payload"))
      .as[(Long, Array[Byte])]
    val f1 = Multimodal.extractFeatures(ds, dim = 8, batchSize = 1).collect().toMap
    val f2 = Multimodal.extractFeatures(ds, dim = 8, batchSize = 16).collect().toMap
    assert(f1.keySet == Set(1L, 2L))
    assert(f1(1L).length == 8)
    // batch size must not change results
    assert(f1(1L).toSeq == f2(1L).toSeq && f1(2L).toSeq == f2(2L).toSeq)
  }

  test("WavHeaders agrees with a WAV written by the JDK's own audio encoder") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val channels = 2; val rate = 22050f; val bits = 16; val frames = 500
    val pcm = Array.tabulate[Byte](frames * channels * bits / 8)(i => (i % 127).toByte)
    val fmt = new AudioFormat(rate, bits, channels, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val row = graft.plans.WavHeaders.parseRow(bos.toByteArray)
    assert(row != null)
    assert(row.getInt(1) == channels)
    assert(row.getLong(2) == 22050L)
    assert(row.getInt(3) == bits)
    assert(row.getLong(4) == pcm.length.toLong)
  }

  test("resampleWavPcm16: hand-checked frame picks over a JDK-written WAV") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def wav(channels: Int, rate: Float, bits: Int, frames: Int,
        sample: Int => Byte): Array[Byte] = {
      val pcm = Array.tabulate[Byte](frames * channels * bits / 8)(sample)
      val fmt = new AudioFormat(rate, bits, channels, true, false)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // mono 16-bit, 8 frames at 16 kHz: sample bytes are just the index
    val mono = wav(1, 16000f, 16, 8, i => i.toByte)
    // stereo: frames must copy whole (all channel bytes together)
    val stereo = wav(2, 16000f, 16, 8, i => i.toByte)
    val eightBit = wav(1, 16000f, 8, 8, i => i.toByte)
    val rows = Seq("mono" -> mono, "stereo" -> stereo,
      "bits8" -> eightBit, "junk" -> "noise".getBytes("UTF-8"),
      "trunc" -> mono.dropRight(4))
    val ds = spark.createDataFrame(rows).toDF("name", "payload")
      .as[(String, Array[Byte])]
    val got = Multimodal.resampleWavPcm16(ds, dstRate = 8000, batchSize = 16)
      .collect().map(r => r.name -> r).toMap
    // 16k -> 8k halves the frames; out frame i reads src frame (i*8 DIV 4)=2i
    assert(got("mono").out_frames == Some(4))
    val monoData = (0 until 16).map(_.toByte) // the pcm payload bytes
    val expectMono = Seq(0, 2, 4, 6).flatMap(f =>
      monoData.slice(f * 2, f * 2 + 2))
    assert(got("mono").resampled.get.toSeq == expectMono)
    // stereo frames are 4 bytes; picks stay frame-aligned
    val stData = (0 until 32).map(_.toByte)
    val expectSt = Seq(0, 2, 4, 6).flatMap(f => stData.slice(f * 4, f * 4 + 4))
    assert(got("stereo").out_frames == Some(4) && got("stereo").channels == Some(2))
    assert(got("stereo").resampled.get.toSeq == expectSt)
    // quarantines: 8-bit PCM, junk, truncated data chunk — nulls, no throw
    for (k <- Seq("bits8", "junk", "trunc"))
      assert(got(k).out_frames.isEmpty && got(k).resampled.isEmpty, k)
    // identity rate copies the data chunk exactly
    val id = Multimodal.resampleWavPcm16(ds, dstRate = 16000, batchSize = 2)
      .collect().map(r => r.name -> r).toMap
    assert(id("mono").resampled.get.toSeq == monoData)
    // batch size must not change bytes
    val b1 = Multimodal.resampleWavPcm16(ds, 8000, batchSize = 1)
      .collect().map(r => r.name -> r.resampled.map(_.toSeq)).toMap
    assert(rows.map(_._1).forall(k => b1(k) == got(k).resampled.map(_.toSeq)))
    // UPsampling doubles frames by duplication: out frame i reads src
    // frame (i*8 DIV 16) = i/2
    val up = Multimodal.resampleWavPcm16(ds, dstRate = 32000, batchSize = 4)
      .collect().map(r => r.name -> r).toMap
    assert(up("mono").out_frames == Some(16))
    val expectUp = (0 until 16).flatMap(i =>
      monoData.slice((i / 2) * 2, (i / 2) * 2 + 2))
    assert(up("mono").resampled.get.toSeq == expectUp)
  }

  test("Mp4Headers walks boxes to mvhd and rejects malformed files") {
    import graft.tools.GenVideoFixtures
    val byName = GenVideoFixtures.fixtures().toMap
    val ok = graft.plans.Mp4Headers.parseRow(byName("mp4_v0_90s"))
    assert(ok != null && ok.getLong(1) == 600L && ok.getLong(2) == 54000L)
    val v1 = graft.plans.Mp4Headers.parseRow(byName("mp4_v1_junk_child"))
    assert(v1 != null && v1.getLong(1) == 90000L && v1.getLong(2) == 2700000L)
    val skip = graft.plans.Mp4Headers.parseRow(byName("mp4_free_and_large"))
    assert(skip != null && skip.getLong(1) == 1000L && skip.getLong(2) == 12345L)
    for (neg <- Seq("mp4_no_moov", "mp4_moov_without_mvhd",
        "mp4_truncated_mvhd", "not_a_video", "empty"))
      assert(graft.plans.Mp4Headers.parseRow(byName(neg)) == null, neg)
  }

  test("sampleFrames slices fixed-size frames with a stride") {
    val frames = Multimodal.sampleFrames(media, "id", "payload", frameBytes = 16, stride = 2)
      .orderBy("id", "frame_idx").collect()
    // id=1: 100 bytes → 7 frames → kept 0,2,4,6; id=2: 33 bytes → 3 frames → 0,2
    val byId = frames.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    assert(byId(1L) == Seq(0L, 2L, 4L, 6L))
    assert(byId(2L) == Seq(0L, 2L))
    // full frames of identical content hash identically; the trailing
    // partial frame (bytes 96..100) differs
    assert(frames.filter(_.getLong(0) == 1L).map(_.getString(2)).distinct.length == 2)
  }
  test("FlacHeaders unpacks every STREAMINFO bit boundary; rejects invalid") {
    import graft.tools.GenFlacFixtures.flac
    val r = graft.plans.FlacHeaders.parseRow(flac(192000, 8, 32, (1L << 35) + 5L))
    assert(r != null)
    assert(r.getLong(1) == 192000L && r.getInt(2) == 8 && r.getInt(3) == 32)
    assert(r.getLong(4) == (1L << 35) + 5L)
    val odd = graft.plans.FlacHeaders.parseRow(flac(22051, 2, 12, 777L))
    assert(odd.getLong(1) == 22051L && odd.getInt(2) == 2 && odd.getInt(3) == 12)
    val bad = flac(44100, 2, 16, 1L); bad(4) = 0x84.toByte
    assert(graft.plans.FlacHeaders.parseRow(bad) == null)
    assert(graft.plans.FlacHeaders.parseRow(Array.emptyByteArray) == null)
    assert(graft.plans.FlacHeaders.parseRow("fLaC".getBytes("US-ASCII")) == null)
  }

  test("ExifHeaders reads orientation through APP0/XMP noise; negatives stay null") {
    import graft.plans.ExifHeaders.orientation
    import graft.tools.GenExifFixtures._
    // every committed fixture decodes to its planted value (or -1)
    val expected = Map(
      "exif_le_ori6" -> 6, "exif_be_ori8" -> 8, "exif_le_ori1_moretags" -> 1,
      "exif_after_app0_ori3" -> 3, "exif_after_xmp_ori2" -> 2,
      "exif_displaced_ifd_ori7" -> 7, "exif_dup_ori_3_then_5" -> 5,
      "exif_wrong_type_long" -> -1, "exif_no_ori_tag" -> -1,
      "exif_truncated_app1" -> -1, "exif_truncated_ifd" -> -1,
      "plain_jpeg_no_exif" -> -1, "not_a_jpeg" -> -1)
    fixtures().foreach { case (name, bytes) =>
      assert(orientation(bytes) == expected(name), name)
    }
    // the EXIF JPEGs still decode image dims through the same marker walk
    val dims = graft.plans.ImageHeaders.parse(
      jpeg(exifApp1(le = true, Seq((274, 3, 6L)))))
    assert(dims.contains(("jpeg", 8, 6)))
    assert(orientation(Array.emptyByteArray) == -1)
  }
}
