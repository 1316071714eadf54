package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.plans.{DHashBmp, DHashKernel}
import graft.tools.GenDHashFixtures

class DHashSpec extends SparkSpec {

  private def dhash(bytes: Array[Byte]): Option[(Long, Long)] =
    Option(DHashKernel.computeRow(bytes)).map(r => (r.getLong(0), r.getLong(1)))

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)

  private lazy val fx = GenDHashFixtures.fixtures().toMap

  test("dHash is exactly invariant to storage order, 2x upscale, brightness") {
    val base = dhash(fx("scene_a")).get
    // top-down re-encode: identical pixels, different row storage
    assert(dhash(fx("scene_a_reenc")).get == base)
    // 2x nearest upscale: the grid's floor sampling picks identical pixels
    assert(dhash(fx("scene_a_up2x")).get == base)
    // global +5 brightness without saturation flips: gradient signs survive
    assert(dhash(fx("scene_a_bright")).get == base)
    // halves are non-negative 32-bit values (no sign-bit cases downstream)
    assert(base._1 >= 0 && base._1 < (1L << 32) && base._2 >= 0 && base._2 < (1L << 32))
  }

  test("logo overlay touching one grid sample flips at most 2 bits; scenes are far") {
    val b = dhash(fx("scene_b")).get
    val logo = dhash(fx("scene_b_logo")).get
    val d = hamming(b, logo)
    assert(d >= 1 && d <= 2, s"logo overlay hamming $d not in [1,2]")
    for (x <- Seq("scene_a", "scene_c")) {
      assert(hamming(b, dhash(fx(x)).get) > 3, s"$x too close to scene_b")
    }
  }

  test("undecodable payloads hash to null (quarantine, never throw)") {
    assert(dhash(fx("dh_bmp32")).isEmpty)
    assert(dhash(fx("dh_not_bmp")).isEmpty)
    assert(dhash(Array.emptyByteArray).isEmpty)
    assert(dhash(Array[Byte]('B', 'M', 0, 1)).isEmpty)
  }

  test("banded hammingPairs64 equals the brute-force scan and drops nulls") {
    import spark.implicits._
    val sig = fx.toSeq.map { case (n, bytes) =>
      val dh = dhash(bytes)
      (n, dh.map(_._1), dh.map(_._2))
    }.toDF("name", "hi", "lo")
    val got = Dedup.hammingPairs64(sig, "name", "hi", "lo", bands = 4, radius = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    // brute force over the decodable fixtures
    val sigs = fx.toSeq.flatMap { case (n, b) => dhash(b).map(n -> _) }
    val expect = (for {
      (na, da) <- sigs; (nb, db) <- sigs if na < nb
      d = hamming(da, db) if d <= 3
    } yield (na, nb, d)).toSet
    assert(got == expect)
    assert(expect.size == 7, s"fixture set should plant exactly 7 pairs, got $expect")
    // no negative fixture ever appears
    assert(!got.exists(p => p._1.startsWith("dh_") || p._2.startsWith("dh_")))
  }

  test("DHashBmp Expression agrees with the kernel through the column path") {
    import spark.implicits._
    val df = fx.toSeq.map { case (n, b) => (n, b) }.toDF("name", "payload")
    val rows = df.select(col("name"), DHashBmp(col("payload")).as("dh"))
      .select(col("name"), col("dh.hi"), col("dh.lo"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    for ((n, b) <- fx) assert(rows(n) == dhash(b), n)
  }

  test("mediaFunnel: one terminal label per asset, dups collapse to min name") {
    import spark.implicits._
    val df = fx.toSeq.map { case (n, b) => (n, b) }.toDF("name", "payload")
    val rows = graft.operators.PrepPipeline.mediaFunnel(df, "name", "payload",
        maxW = 64, maxH = 48, bands = 4, radius = 3,
        trainFrac = 0.6, validFrac = 0.2)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.size == fx.size, "exactly one row per asset")
    // undecodables quarantine
    assert(rows("dh_bmp32") == "10_quarantined_undecodable")
    assert(rows("dh_not_bmp") == "10_quarantined_undecodable")
    // each perceptual component keeps only its lexicographic-min member
    for (dup <- Seq("scene_a_reenc", "scene_a_up2x", "scene_a_bright", "scene_b_logo"))
      assert(rows(dup) == "20_dropped_dup", dup)
    for (kept <- Seq("scene_a", "scene_b", "scene_c"))
      assert(rows(kept).startsWith("30_kept_"), s"$kept -> ${rows(kept)}")
  }

  test("incremental batch-vs-corpus pairs: dups rediscover originals, novel items stay absent") {
    import spark.implicits._
    val sig = fx.toSeq.map { case (n, bytes) =>
      val dh = dhash(bytes)
      (n, dh.map(_._1), dh.map(_._2))
    }.toDF("name", "hi", "lo")
    val re = "_(reenc|up2x|bright|logo)$"
    val got = Dedup.hammingPairs64Batch(
        sig.filter(!col("name").rlike(re)), sig.filter(col("name").rlike(re)),
        "name", "hi", "lo", bands = 4, radius = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("scene_a_reenc", "scene_a"), ("scene_a_up2x", "scene_a"),
      ("scene_a_bright", "scene_a"), ("scene_b_logo", "scene_b")))
    // a genuinely novel batch item produces NO row — the admit signal
    val novel = Seq(("novel_img", Some(0x12345678L), Some(0x0abcdef0L)))
      .toDF("name", "hi", "lo")
    assert(Dedup.hammingPairs64Batch(sig, novel,
      "name", "hi", "lo", bands = 4, radius = 3).count() == 0)
  }

  test("band-index probe equals the direct batch join; the index side never shuffles") {
    import spark.implicits._
    val sig = fx.toSeq.map { case (n, bytes) =>
      val dh = dhash(bytes)
      (n, dh.map(_._1), dh.map(_._2))
    }.toDF("name", "hi", "lo")
    val re = "_(reenc|up2x|bright|logo)$"
    val corpus = sig.filter(!col("name").rlike(re))
    val batch = sig.filter(col("name").rlike(re))
    val tab = "g_dhash_bandidx_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tab")
    // a fresh catalog may not know a table whose warehouse dir survives
    // from an earlier JVM — CTAS refuses such a location (the
    // LayoutQueries.ensureTable discipline)
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tab)
    val whFs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (whFs.exists(wh)) whFs.delete(wh, true)
    graft.util.Layout.writeBucketed(
      graft.operators.Dedup.bandIndex64(corpus, "name", "hi", "lo", bands = 4)
        .repartition(4, col("bk")),
      tab, "bk", 4, Some("bk"))
    val probe = graft.operators.Dedup.hammingPairs64Probe(
      spark.table(tab), batch, "name", "hi", "lo", bands = 4, radius = 3)
    val direct = graft.operators.Dedup.hammingPairs64Batch(
      corpus, batch, "name", "hi", "lo", bands = 4, radius = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(rows(probe) == rows(direct))
    assert(rows(probe).nonEmpty)
    // the point of the index: the corpus side is scanned bucket-aligned,
    // in place — its FileScan feeds the join with NO Exchange above it
    probe.count() // settle AQE
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"index scan must be bucketed:\n$plan")
  }

  test("fold-in compaction preserves the bucketed exchange-free scan") {
    import spark.implicits._
    val sig = fx.toSeq.map { case (n, bytes) =>
      val dh = dhash(bytes)
      (n, dh.map(_._1), dh.map(_._2))
    }.toDF("name", "hi", "lo")
    val re = "_(reenc|up2x|bright|logo)$"
    val corpus = sig.filter(!col("name").rlike(re))
    val batch = sig.filter(col("name").rlike(re))
    def freshTable(tab: String): String = {
      spark.sql(s"DROP TABLE IF EXISTS $tab")
      val wh = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), tab)
      val whFs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (whFs.exists(wh)) whFs.delete(wh, true)
      tab
    }
    val init = freshTable("g_dhash_compact_spec_init")
    graft.util.Layout.writeBucketed(
      graft.operators.Dedup.bandIndex64(
          corpus.filter(col("name") < "scene_b"), "name", "hi", "lo", bands = 4)
        .repartition(4, col("bk")),
      init, "bk", 4, Some("bk"))
    // the fold-in: existing index rows ∪ the tail's band rows only
    val comp = freshTable("g_dhash_compact_spec_comp")
    graft.util.Layout.writeBucketed(
      spark.table(init)
        .unionByName(graft.operators.Dedup.bandIndex64(
          corpus.filter(col("name") >= "scene_b"), "name", "hi", "lo", bands = 4))
        .repartition(4, col("bk")),
      comp, "bk", 4, Some("bk"))
    val probe = graft.operators.Dedup.hammingPairs64Probe(
      spark.table(comp), batch, "name", "hi", "lo", bands = 4, radius = 3)
    // fold-in equals a full rebuild equals the direct join
    val direct = graft.operators.Dedup.hammingPairs64Batch(
      corpus, batch, "name", "hi", "lo", bands = 4, radius = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(rows(probe) == rows(direct))
    // a pair only findable through the APPENDED half — the fold-in is
    // load-bearing, not vacuous
    assert(rows(probe).exists(_._2 == "scene_b"))
    // the compacted table still planes the exchange-free bucket-aligned scan
    probe.count()
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"compacted index scan must stay bucketed:\n$plan")
  }

  test("pigeonhole recall: random radius-3 corruptions are always found") {
    // adversarial check of the band math (hi/lo split, MSB-first chunks):
    // flip <=3 random bits of a signature; the banded join must find the
    // pair for every draw — exactness, not probability.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = dhash(fx("scene_c")).get
    val rows = (0 until 20).map { i =>
      var (hi, lo) = base
      val flips = rnd.shuffle((0 until 64).toList).take(1 + rnd.nextInt(3))
      flips.foreach { bit =>
        if (bit < 32) hi ^= 1L << (31 - bit) else lo ^= 1L << (63 - bit)
      }
      (s"mut_$i", hi, lo)
    } :+ (("base", base._1, base._2))
    val pairs = Dedup.hammingPairs64(rows.toDF("name", "hi", "lo"),
      "name", "hi", "lo", bands = 4, radius = 3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    for (i <- 0 until 20)
      assert(pairs.contains(("base", s"mut_$i")) || pairs.contains((s"mut_$i", "base")),
        s"mut_$i lost by the banded join")
  }
}
