package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.{AnnIndex, Similarity}

class AnnIndexSpec extends SparkSpec {

  private val dim = 8

  /** 80 deterministic vectors with 4 loose directional clusters. */
  private def corpus = {
    val rows = (0 until 80).map { i =>
      val base = i % 4
      val v = (0 until dim).map { d =>
        val anchor = if (d == base * 2) 1.0 else 0.0
        (anchor + 0.1 * math.sin(i * 37.0 + d * 11.0)).toFloat
      }
      Row(i.toLong, v)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 4), schema)
  }

  private def tmpRoot(name: String): String = {
    val f = java.nio.file.Files.createTempDirectory(name).toFile
    f.deleteOnExit()
    f.getAbsolutePath
  }

  test("persisted-index query is byte-identical to the inline operator") {
    val c = corpus
    val q = c.filter(org.apache.spark.sql.functions.col("vec_id") < 6)
    val root = tmpRoot("annindex_parity")
    AnnIndex.buildIvfPq(c, "vec_id", "embedding", dim,
      nlist = 4, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, root)
    val loaded = AnnIndex.queryIvfPq(c, q, "vec_id", "embedding", dim,
      k = 3, nprobe = 2, rerank = 8, dir = root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val inline = Similarity.ivfPqTopK(c, q, "vec_id", "embedding", dim,
      k = 3, nlist = 4, itersCoarse = 2, nprobe = 2, m = 4, ksub = 4,
      itersPq = 2, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(loaded == inline, s"loaded $loaded\nvs inline $inline")
    assert(loaded.nonEmpty && loaded.groupBy(_._1).size == 6)
  }

  test("an nlist=1 index IS pure PQ: serve path equals pqTopK at equal params") {
    // e11's round-6 claim: one coarse list means every probe scans all
    // codes, so the persisted-index serve path must reproduce the inline
    // PRODUCT-quantization operator exactly (same codebook training
    // params, same ADC candidate ranking, same exact rerank)
    val c = corpus
    val q = c.filter(org.apache.spark.sql.functions.col("vec_id") < 6)
    val root = tmpRoot("annindex_pq1")
    AnnIndex.buildIvfPq(c, "vec_id", "embedding", dim,
      nlist = 1, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, root)
    val serve = AnnIndex.queryIvfPq(c, q, "vec_id", "embedding", dim,
      k = 3, nprobe = 1, rerank = 8, dir = root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    val purePq = Similarity.pqTopK(c, q, "vec_id", "embedding", dim,
      m = 4, ksub = 4, iters = 2, k = 3, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(serve == purePq, s"serve $serve\nvs pure PQ $purePq")
  }

  test("recall@k does not drop when nprobe widens to all lists") {
    // the per-query recall knob e12 turns on ONE immutable index: at
    // nprobe = nlist every list is scanned (pure-PQ behavior), which on
    // this fixture must recall at least as much of the brute-force truth
    // as the nprobe=2 partial probe
    import org.apache.spark.sql.functions.col
    val c = corpus
    val q = c.filter(col("vec_id") < 6)
    val root = tmpRoot("annindex_recall")
    AnnIndex.buildIvfPq(c, "vec_id", "embedding", dim,
      nlist = 4, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, root)
    val truth = Similarity.cosineTopK(c, q, "vec_id", "embedding", dim, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // rerank=40 (half the corpus): the test isolates the nprobe knob —
    // a 4-codeword/subspace PQ on an 8-dim fixture ties heavily, so a
    // narrow rerank window would measure code-collision luck, not probing
    def recall(nprobe: Int): Double = {
      val got = AnnIndex.queryIvfPq(c, q, "vec_id", "embedding", dim,
        k = 3, nprobe = nprobe, rerank = 40, dir = root)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & truth).size.toDouble / truth.size
    }
    val r2 = recall(2)
    val r4 = recall(4)
    assert(r4 >= r2, s"recall fell as nprobe widened: $r2 -> $r4")
    assert(r4 >= 0.5, s"full-scan recall@3 too low on the fixture: $r4")
  }

  test("filtered search: pre-filter is exact over the subset; post-filter loses rows") {
    import org.apache.spark.sql.functions._
    val c = corpus
    val q = c.filter(col("vec_id") < 4)
    val root = tmpRoot("annindex_filtered")
    AnnIndex.buildIvfPq(c, "vec_id", "embedding", dim,
      nlist = 4, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, root)
    val pred = col("neighbor_id") % 4 === 1 // selective: 1/4 of the corpus
    val pre = AnnIndex.queryIvfPq(c, q, "vec_id", "embedding", dim,
      k = 5, nprobe = 4, rerank = 10, dir = root, scanPred = Some(pred))
      .collect()
    // every returned neighbor satisfies the predicate, every query gets k
    assert(pre.forall(_.getLong(1) % 4 == 1))
    assert(pre.groupBy(_.getLong(0)).forall(_._2.length == 5))
    // post-filtering the UNfiltered top-k keeps only qualifying rows that
    // happened to rank top-5 overall — strictly fewer than k when the
    // filter is selective (the recall loss pre-filtering exists to avoid)
    val post = AnnIndex.queryIvfPq(c, q, "vec_id", "embedding", dim,
      k = 5, nprobe = 4, rerank = 10, dir = root)
      .filter(col("neighbor_id") % 4 === 1).collect()
    assert(post.length < pre.length,
      s"post-filter kept ${post.length} rows vs pre-filter ${pre.length}")
  }

  test("the codes table stores m codes per row, never the vectors") {
    val root = tmpRoot("annindex_codes")
    AnnIndex.buildIvfPq(corpus, "vec_id", "embedding", dim,
      nlist = 4, itersCoarse = 1, m = 4, ksub = 4, itersPq = 1, root)
    val codes = spark.read.parquet(s"$root/codes")
    val names = codes.schema.fieldNames.toSet
    assert(names == Set("neighbor_id", "list_id", "cnorm",
      "code0", "code1", "code2", "code3"))
    assert(!codes.schema.exists(_.dataType.isInstanceOf[ArrayType]),
      "index codes must not duplicate the float vectors")
    assert(codes.count() == 80)
    val cents = spark.read.parquet(s"$root/centroids")
    assert(cents.count() == 4)
    assert(spark.read.parquet(s"$root/codebooks").count() == 16)
  }

  test("streaming query batches served from the persisted index match batch answers") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val c = corpus
    val root = tmpRoot("annindex_stream")
    AnnIndex.buildIvfPq(c, "vec_id", "embedding", dim,
      nlist = 4, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, root)
    def vecOf(i: Int): Seq[Float] = (0 until dim).map { d =>
      val anchor = if (d == (i % 4) * 2) 1.0 else 0.0
      (anchor + 0.1 * math.sin(i * 37.0 + d * 11.0)).toFloat
    }
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.Set[(Long, Long, Double, Long)]()
    val q = in.toDF().toDF("vec_id", "embedding")
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        val out = AnnIndex.queryIvfPq(c, b, "vec_id", "embedding", dim,
            k = 3, nprobe = 2, rerank = 8, dir = root)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        got.synchronized { got ++= out }
        ()
      }.start()
    in.addData((0L, vecOf(0)), (1L, vecOf(1)))
    q.processAllAvailable()
    in.addData((2L, vecOf(2)))
    q.processAllAvailable()
    q.stop()
    val expected = Similarity.ivfPqTopK(c,
        c.filter(org.apache.spark.sql.functions.col("vec_id") < 3),
        "vec_id", "embedding", dim, k = 3, nlist = 4, itersCoarse = 2,
        nprobe = 2, m = 4, ksub = 4, itersPq = 2, rerank = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(got.toSet == expected, s"stream ${got.toSet}\nvs batch $expected")
  }

  test("append encodes with the stored codebooks and appended docs are retrievable") {
    import org.apache.spark.sql.functions.col
    val c = corpus
    val seed = c.filter(col("vec_id") < 60)
    val extra = c.filter(col("vec_id") >= 60)
    val root = tmpRoot("annindex_append")
    AnnIndex.buildIvfPq(seed, "vec_id", "embedding", dim,
      nlist = 4, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, root)
    assert(spark.read.parquet(s"$root/codes").count() == 60)
    AnnIndex.appendIvfPq(extra, "vec_id", "embedding", dim, root)
    assert(spark.read.parquet(s"$root/codes").count() == 80)
    // a query identical to an appended vector must retrieve it at rank 1
    // once the rerank window covers its PQ-code tie group (identical codes
    // tie on the reconstruction score and break by id, so a small rerank
    // can drop a high-id doc — the standard PQ ties effect; the exact
    // rerank then puts the true cosine-1.0 match first)
    val q = extra.filter(col("vec_id") === 72)
      .select(col("vec_id").as("qid2"), col("embedding"))
      .select(org.apache.spark.sql.functions.lit(9901L).as("vec_id"), col("embedding"))
    val top = AnnIndex.queryIvfPq(c, q, "vec_id", "embedding", dim,
        k = 1, nprobe = 2, rerank = 40, dir = root)
      .collect().head
    assert(top.getLong(1) == 72L, s"expected appended doc 72, got $top")
    assert(math.abs(top.getDouble(2) - 1.0) < 1e-9)
  }

  test("append order does not change query answers") {
    import org.apache.spark.sql.functions.col
    val c = corpus
    def buildWith(order: Seq[(Long, Long)], name: String): String = {
      val root = tmpRoot(name)
      AnnIndex.buildIvfPq(c.filter(col("vec_id") < 60), "vec_id", "embedding",
        dim, nlist = 4, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, root)
      order.foreach { case (lo, hi) =>
        AnnIndex.appendIvfPq(
          c.filter(col("vec_id") >= lo && col("vec_id") < hi),
          "vec_id", "embedding", dim, root)
      }
      root
    }
    val r1 = buildWith(Seq((60L, 70L), (70L, 80L)), "annindex_ord1")
    val r2 = buildWith(Seq((70L, 80L), (60L, 70L)), "annindex_ord2")
    val q = c.filter(col("vec_id") < 4)
    def ans(root: String) = AnnIndex.queryIvfPq(c, q, "vec_id", "embedding",
        dim, k = 3, nprobe = 2, rerank = 8, dir = root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(ans(r1) == ans(r2))
  }

  test("drift monitor: recall degrades on a planted OOD batch, not on an in-dist one") {
    // e19's rebuild-trigger signal, exercised end to end: append two
    // batches to base-trained indexes — one IN-DISTRIBUTION (vectors near
    // the four trained clusters) and one OUT-OF-DISTRIBUTION (anchors on
    // dims the base never populated). Stale codebooks encode the in-dist
    // batch fine; the OOD batch collapses onto whatever codewords exist
    // (heavy code ties → ADC can't rank the batch's true mutual
    // neighbors), so the monitor's recall@k over the appended vectors
    // must come out measurably lower — that dip IS the rebuild signal.
    import org.apache.spark.sql.functions.col
    val c = corpus // ids 0..79, 4 clusters anchored on even dims
    def mkBatch(ids: Range, vec: Int => Seq[Float]) = {
      val rows = ids.map(i => Row(i.toLong, vec(i)))
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 2),
        c.schema)
    }
    // in-dist: same cluster anchors, different phase
    val inDist = mkBatch(200 until 220, { i =>
      (0 until dim).map { d =>
        val anchor = if (d == (i % 4) * 2) 1.0 else 0.0
        (anchor + 0.1 * math.sin(i * 53.0 + d * 29.0)).toFloat
      }
    })
    // OOD: anchors on odd dims the base corpus never used
    val ood = mkBatch(300 until 320, { i =>
      (0 until dim).map { d =>
        val anchor = if (d == 1 + (i % 2) * 4) 1.0 else 0.0
        (anchor + 0.05 * math.sin(i * 13.0 + d * 7.0)).toFloat
      }
    })
    def monitorRecall(batch: org.apache.spark.sql.DataFrame,
        root: String): Double = {
      val full = c.unionByName(batch)
      val got = Similarity.recallAtK(
        approx = AnnIndex.queryIvfPq(full, batch, "vec_id", "embedding",
          dim, k = 3, nprobe = 2, rerank = 12, dir = root),
        exact = Similarity.cosineTopK(full, batch, "vec_id", "embedding",
          dim, k = 3))
        .collect().map(_.getAs[Double]("recall"))
      got.sum / got.length
    }
    def staleIndex(batch: org.apache.spark.sql.DataFrame, name: String) = {
      val root = tmpRoot(name)
      AnnIndex.buildIvfPq(c, "vec_id", "embedding", dim,
        nlist = 4, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, root)
      AnnIndex.appendIvfPq(batch, "vec_id", "embedding", dim, root)
      root
    }
    val rInDist = monitorRecall(inDist, staleIndex(inDist, "annindex_mon_in"))
    val rOod = monitorRecall(ood, staleIndex(ood, "annindex_mon_ood"))
    assert(rInDist > rOod + 0.1,
      s"monitor failed to separate: in-dist $rInDist vs OOD $rOod")
    // and a rebuild (codebooks retrained WITH the drifted batch) recovers:
    // the post-rebuild monitor must not read worse than the stale one
    val rebuilt = tmpRoot("annindex_mon_rebuilt")
    AnnIndex.buildIvfPq(c.unionByName(ood), "vec_id", "embedding", dim,
      nlist = 4, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, rebuilt)
    val rRebuilt = monitorRecall(ood, rebuilt)
    assert(rRebuilt >= rOod,
      s"rebuild made the monitor worse: stale $rOod vs rebuilt $rRebuilt")
  }

  test("the codes scan is partition-pruned to the probed lists") {
    import org.apache.spark.sql.functions.col
    val c = corpus
    val q = c.filter(col("vec_id") < 2)
    val root = tmpRoot("annindex_prune")
    AnnIndex.buildIvfPq(c, "vec_id", "embedding", dim,
      nlist = 4, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, root)
    // list_id is a hive PARTITION column: one directory per coarse list,
    // one data file per list per write (the file-count contract)
    val listDirs = new java.io.File(s"$root/codes").listFiles()
      .filter(_.getName.startsWith("list_id=")).toSeq
    assert(listDirs.size >= 2, s"expected list_id partitions, got $listDirs")
    assert(listDirs.forall(
      _.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "each list partition must hold exactly one file per write")
    // and the probe turns its probed-list set into a PartitionFilter, so
    // the scan physically reads ONLY those directories — the IVF promise
    // (work ∝ nprobe/nlist) applied to scan BYTES, not just join width
    val res = AnnIndex.queryIvfPq(c, q, "vec_id", "embedding", dim,
      k = 3, nprobe = 1, rerank = 8, dir = root)
    val plan = res.queryExecution.executedPlan.toString
    val codesScan = plan.linesIterator
      .find(l => l.contains(s"codes") && l.contains("PartitionFilters"))
    assert(codesScan.exists(_.matches(""".*PartitionFilters: \[[^\]]*list_id[^\]]*IN[^\]]*\].*""")),
      s"codes scan is not partition-pruned by the probed lists:\n$plan")
  }

  test("codes compaction folds batch partitions into the base without changing answers") {
    import org.apache.spark.sql.functions.col
    val c = corpus
    val root = tmpRoot("annindex_compact")
    AnnIndex.buildIvfPq(c.filter(col("vec_id") < 60), "vec_id", "embedding",
      dim, nlist = 4, itersCoarse = 2, m = 4, ksub = 4, itersPq = 2, root,
      ingestBatch = Some(-1L))
    AnnIndex.appendIvfPq(c.filter(col("vec_id") >= 60 && col("vec_id") < 70),
      "vec_id", "embedding", dim, root, ingestBatch = Some(0L))
    AnnIndex.appendIvfPq(c.filter(col("vec_id") >= 70),
      "vec_id", "embedding", dim, root, ingestBatch = Some(1L))
    val q = c.filter(col("vec_id") < 6)
    def ans(dir: String) = AnnIndex.queryIvfPq(c, q, "vec_id", "embedding",
        dim, k = 3, nprobe = 2, rerank = 20, dir = dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    def manifest(dir: String) = AnnIndex.readCodes(spark, dir)
      .groupBy(col("list_id"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(col("neighbor_id")).as("ids"),
        org.apache.spark.sql.functions.sum(col("code0")).as("c0"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    def parts(dir: String) = new java.io.File(s"$dir/codes").listFiles()
      .map(_.getName).filter(_.startsWith("ingest_batch=")).toSet
    val before = ans(root)
    val manifestBefore = manifest(root)
    assert(parts(root) == Set("ingest_batch=-1", "ingest_batch=0", "ingest_batch=1"))
    // full fold: every committed batch collapses into the bootstrap
    // partition; probes and the whole-index manifest are bit-unchanged
    val v2 = tmpRoot("annindex_compact_v2")
    AnnIndex.compactCodes(spark, root, v2, through = 1L)
    assert(parts(v2) == Set("ingest_batch=-1"))
    assert(ans(v2) == before, "compaction changed probe answers")
    assert(manifest(v2) == manifestBefore, "compaction changed the codes manifest")
    // partial fold: batches past the watermark keep their own partitions
    // (they may still replay), and a replayed batch on the compacted
    // index stays exactly-once via its surviving partition
    val v3 = tmpRoot("annindex_compact_v3")
    AnnIndex.compactCodes(spark, root, v3, through = 0L)
    assert(parts(v3) == Set("ingest_batch=-1", "ingest_batch=1"))
    assert(ans(v3) == before)
    AnnIndex.appendIvfPq(c.filter(col("vec_id") >= 70),
      "vec_id", "embedding", dim, v3, ingestBatch = Some(1L))
    assert(AnnIndex.readCodes(spark, v3).count() == 80,
      "replayed batch duplicated rows after partial compaction")
    assert(ans(v3) == before)
    // the old directory is untouched (the versioned-dir crash-safety)
    assert(ans(root) == before && manifest(root) == manifestBefore)
  }

  test("querying an index built for another dim fails loudly") {
    val root = tmpRoot("annindex_dim")
    AnnIndex.buildIvfPq(corpus, "vec_id", "embedding", dim,
      nlist = 2, itersCoarse = 1, m = 2, ksub = 2, itersPq = 1, root)
    val ex = intercept[IllegalArgumentException] {
      AnnIndex.queryIvfPq(corpus, corpus.limit(1), "vec_id", "embedding",
        dim = 16, k = 1, nprobe = 1, rerank = 1, dir = root)
    }
    assert(ex.getMessage.contains("built for dim"))
  }
}
