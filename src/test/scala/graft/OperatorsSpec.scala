package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Quantiles, Sampling, Similarity, SpaceSavingSketch}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank now"), // near-dup of 0
    (2L, "completely different words about spark catalyst optimizer and shuffles"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
  ).toDF("doc_id", "text")

  test("exactDupGroups groups identical content") {
    val g = Dedup.exactDupGroups(docs, "doc_id", "text")
    assert(g.count() == 3)
    assert(g.filter(col("n_docs") === 2 && col("min_id") === 0).count() == 1)
  }

  test("ngramJaccardPairs finds the planted near-dup and not the unrelated doc") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 3L)))
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("dedup operators release their cached relations on return (no session leak)") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    spark.catalog.clearCache() // isolate from whatever ran before
    val ops: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "ngramJaccardPairs" -> (() => Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)),
      "ngramJaccardPairsPrefix" -> (() => Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", 3, 0.5)),
      "minhashLshPairs" -> (() => Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 12, 3, 0.8)),
      "dropNearDuplicates" -> (() => Dedup.dropNearDuplicates(docs, "doc_id", "text", 3, 12, 3, 0.8)),
      "dupClusters" -> (() => Dedup.dupClusters(docs, "doc_id", "text", 3, 12, 3, 0.8)),
      "containmentPairs" -> (() => Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.9)),
      "clusterSafeSplit" -> (() => Dedup.clusterSafeSplit(docs, "doc_id", "text", 3, 12, 3, 0.8, 0.8, 0.1)),
      "keepBestInCluster" -> (() => Dedup.keepBestInCluster(docs, "doc_id", "text", 3, 12, 3, 0.8)))
    for ((name, op) <- ops) {
      op().count() // materialize like a caller would
      assert(ColumnBridge.noCachedRelations(spark),
        s"$name left persisted relations registered in the session cache")
    }
  }

  test("crossSourceDupMatrix attributes near-dup pairs to source pairs") {
    val srcDocs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog near the river bank today", "crawlA"),
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today", "crawlB"),
      (2L, "completely different words about spark catalyst optimizer and shuffles", "crawlB"),
    ).toDF("doc_id", "text", "source")
    val m = Dedup.crossSourceDupMatrix(srcDocs, "doc_id", "text", "source",
        3, 12, 3, 0.8)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(m == Map(("crawlA", "crawlB") -> 1L))
  }

  test("dupClusters finds TRANSITIVE components the greedy pair view misses") {
    // chain: jaccard(10,11)=0.8 and jaccard(11,12)=0.83 pass the 0.7
    // threshold; jaccard(10,12)=0.67 does NOT — 10 and 12 can only join
    // through 11, so all three in cluster 10 proves transitive closure
    val chain = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota kappa x y"),
      (12L, "alpha beta gamma delta epsilon zeta eta theta iota kappa x y z w"),
      (20L, "completely different content about catalyst plans and shuffles")
    ).toDF("doc_id", "text")
    val clusters = graft.operators.Dedup
      .dupClusters(chain, "doc_id", "text", 3, 12, 2, 0.7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(10L) == 10L && clusters(11L) == 10L)
    assert(clusters(20L) == 20L)
    // transitivity: 12 joins via 11 (pairwise 10~12 may or may not pass 0.5,
    // but 11 links them either way)
    assert(clusters(12L) == 10L)
  }

  test("connectedComponents converges on a diameter-50 chain in O(log d) rounds") {
    // path graph 0-1-2-...-50: min-label needs ~50 plain-propagation rounds,
    // far over the 10-round budget given here — only pointer doubling
    // (depth halves per round, ~6 rounds for d=50) can converge in time
    val pairs = (0L until 50L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = graft.operators.Dedup.connectedComponents(pairs, maxIters = 10)
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m.size == 51)
    assert(m.values.forall(_ == 0L), "every chain node labels to the component min")
    // two components + an isolated edge keep their own minima
    val two = Seq((5L, 6L), (6L, 7L), (30L, 31L)).toDF("id_a", "id_b")
    val m2 = graft.operators.Dedup.connectedComponents(two, maxIters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m2 == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 30L -> 30L, 31L -> 30L))
  }

  test("decontaminate: full-overlap doc flagged, disjoint doc clean, fraction exact") {
    val train = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"), // contained in eval
      (101L, "spark catalyst tungsten codegen whole stage pipelines")
    ).toDF("doc_id", "text")
    val eval_ = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today and tomorrow")
    ).toDF("doc_id", "text")
    val flags = graft.operators.Decontaminate
      .overlapFlags(train, eval_, "doc_id", "text", 3, 0.5)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(flags(100L)._1 == 7 && flags(100L)._2 == 1.0 && flags(100L)._3)
    assert(flags(101L)._1 == 0 && !flags(101L)._3)
  }

  test("groupedQuantileCont matches built-in percentile bit-for-bit") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val viaSort = Quantiles
      .groupedQuantileCont(part, "p_brand", "p_retailprice",
        Seq("p50" -> 0.5, "p90" -> 0.9))
      .select("p_brand", "p50", "p90", "n").orderBy("p_brand").collect().toSeq
    val viaBuffer = part.groupBy("p_brand")
      .agg(expr("percentile(p_retailprice, 0.5)").as("p50"),
        expr("percentile(p_retailprice, 0.9)").as("p90"),
        count(lit(1)).as("n"))
      .orderBy("p_brand").collect().toSeq
    assert(viaSort == viaBuffer)
  }

  test("quadratic small-corpus forms refuse inputs over maxRows (escape hatch works)") {
    intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, maxRows = 2)
    }
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(docs.selectExpr("doc_id as vec_id",
        "array(1.0f, 0.0f) as embedding"), "vec_id", "embedding", 2, 0.9, maxRows = 2)
    }
    intercept[IllegalArgumentException] {
      val v = docs.selectExpr("doc_id as vec_id", "array(1.0f, 0.0f) as embedding")
      Similarity.cosineTopK(v, v, "vec_id", "embedding", 2, 1, maxQueryRows = 2)
    }
    // raising the cap opts back in
    assert(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5, maxRows = 10)
      .count() > 0)
  }

  test("prefix-filtered jaccard equals the plain inverted-index form at several thresholds") {
    val docs500 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (t <- Seq(0.4, 0.6, 0.8)) {
      val plain = Dedup.ngramJaccardPairs(docs500, "doc_id", "text", 3, t)
        .select("id_a", "id_b", "n_common").orderBy("id_a", "id_b")
      val prefix = Dedup.ngramJaccardPairsPrefix(docs500, "doc_id", "text", 3, t)
        .select("id_a", "id_b", "n_common").orderBy("id_a", "id_b")
      assert(plain.collect().toSeq == prefix.collect().toSeq, s"threshold $t")
    }
  }

  test("minhashLshPairs finds the same high-similarity pairs as exact jaccard") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 12, 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact && exact.nonEmpty)
  }

  test("containmentPairs: embedded short doc scores 1.0 one-way while jaccard stays blind") {
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val filler = (1 to 40).map(i => s"filler$i").mkString(" ")
    val embed = Seq(
      (10L, short),
      (11L, short + " " + filler), // the short doc pasted whole into a longer one
      (12L, "totally unrelated words about catalyst and tungsten engines here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(embed, "doc_id", "text", 3, 0.9)
      .select("id_inner", "id_outer", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs.exists { case (i, o, c) => i == 10L && o == 11L && c == 1.0 })
    assert(!pairs.exists { case (i, o, _) => i == 11L && o == 10L }) // asymmetric
    // symmetric jaccard never fires on the embedded pair at a useful threshold
    assert(Dedup.ngramJaccardPairs(embed, "doc_id", "text", 3, 0.5).count() == 0)
  }

  test("containmentPairs equals brute-force set containment on the fixture corpus") {
    val docs500 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Dedup.containmentPairs(docs500, "doc_id", "text", 3, 0.9)
      .select("id_inner", "id_outer", "n_common")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sets = docs500.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).trim.split("\\s+").filter(_.nonEmpty).toSeq
      r.getLong(0) -> (if (toks.size < 3) Set.empty[String]
                       else toks.sliding(3).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty)
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      common = (sa & sb).size
      if common.toDouble / sa.size >= 0.9
    } yield (ia, ib, common.toLong)).toSet
    assert(got == want && want.nonEmpty)
  }

  test("clusterSafeSplit: no near-dup pair straddles the train/eval boundary") {
    val docs500 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val split = Dedup.clusterSafeSplit(docs500, "doc_id", "text", 3, 12, 3, 0.8, 0.8, 0.1)
    assert(split.count() == docs500.count()) // every doc assigned exactly once
    assert(split.select("split").distinct().count() >= 2) // non-degenerate
    val sides = split.select(col("id"), col("split"))
    val straddling = Dedup.minhashLshPairs(docs500, "doc_id", "text", 3, 12, 3, 0.8)
      .join(sides.as("x"), col("id_a") === col("x.id"))
      .join(sides.as("y"), col("id_b") === col("y.id"))
      .filter(col("x.split") =!= col("y.split"))
    assert(straddling.count() == 0)
    // the id-hash split DOES straddle on this corpus — the leak this fixes
    val idSides = Sampling.split(docs500, "doc_id", 0.8, 0.1)
      .select(col("doc_id").as("id"), col("split"))
    val idStraddling = Dedup.minhashLshPairs(docs500, "doc_id", "text", 3, 12, 3, 0.8)
      .join(idSides.as("x"), col("id_a") === col("x.id"))
      .join(idSides.as("y"), col("id_b") === col("y.id"))
      .filter(col("x.split") =!= col("y.split"))
    assert(idStraddling.count() > 0)
  }

  test("keepBestInCluster keeps the most complete variant, not the lowest id") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val tri = Seq(
      (0L, base), // truncated variant, lowest id
      (1L, base + " on a sunny morning"), // most complete variant, higher id
      (2L, "unrelated catalyst tungsten shuffle text entirely different here"))
      .toDF("doc_id", "text")
    val kept = Dedup.keepBestInCluster(tri, "doc_id", "text", 3, 12, 2, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(kept.map(_._1) == Set(1L, 2L)) // doc 0 lost to its longer twin
    assert(kept.contains((1L, 0L, 17L))) // cluster label stays the min id
  }

  test("bigramLmScore: hand-computed frequencies, rare counts, and means") {
    import graft.operators.CorpusStats
    val tiny = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "x")).toDF("doc_id", "text")
    val got = CorpusStats.bigramLmScore(tiny, "doc_id", "text", minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // corpus bigram counts: "a b"=3 ("a b a b" yields it twice), "b a"=1, "b c"=1
    assert(got == Set(
      (0L, 3L, 1L, (3 + 1 + 3) / 3.0), // doc 0: bigrams [a b, b a, a b]
      (1L, 2L, 1L, (3 + 1) / 2.0))) // doc 2 has no bigrams and is absent
  }

  test("sourceVocabOverlap: exact shared vocab and jaccard; disjoint pair absent") {
    import graft.operators.CorpusStats
    val tiny = Seq(
      ("s1", "a b c"), ("s1", "a"), // s1 vocab {a,b,c}
      ("s2", "b c d"), // s2 vocab {b,c,d}
      ("s3", "x")) // s3 vocab {x} — shares nothing
      .toDF("source", "text")
    val got = CorpusStats.sourceVocabOverlap(tiny, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got == Set(("s1", "s2", 2L, 3L, 3L, 2.0 / 4.0)))
  }

  test("simhash: near-dups land within small hamming distance, unrelated far") {
    val h = Dedup.simhash(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def hamming(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    assert(h(0L) == h(3L)) // identical text → identical simhash
    // one-word edit sits strictly closer than an unrelated doc
    assert(hamming(h(0L), h(1L)) < hamming(h(0L), h(2L)))
    assert(hamming(h(0L), h(1L)) <= 3)
  }

  test("simhashInt folds the same bits as the bit-string simhash") {
    val bits = 16
    val str = Dedup.simhash(docs, "doc_id", "text", bits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ints = Dedup.simhashInt(docs, "doc_id", "text", bits)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, s) <- str)
      assert(ints(id) == java.lang.Long.parseLong(s, 2), s"doc $id")
  }

  test("simhashHammingPairs equals brute force (pigeonhole: radius < bands)") {
    val docs500 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (bits, bands, radius) = (32, 4, 3)
    val got = Dedup.simhashHammingPairs(docs500, "doc_id", "text",
        bits, bands, radius)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sh = Dedup.simhashInt(docs500, "doc_id", "text", bits)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      d = java.lang.Long.bitCount(sa ^ sb) if d <= radius
    } yield (ia, ib, d)).toSet
    assert(got == brute)
    assert(got.nonEmpty) // the planted near-dups must actually surface
  }

  test("simhashHammingPairs rejects a radius the pigeonhole cannot cover") {
    intercept[IllegalArgumentException] {
      Dedup.simhashHammingPairs(docs, "doc_id", "text",
        bits = 32, bands = 4, radius = 4)
    }
  }

  val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(0.9f, 0.1f, 0f, 0f)), // closest to 0
    (2L, Array(0f, 1f, 0f, 0f)),
    (3L, Array(-1f, 0f, 0f, 0f)),    // opposite of 0
  ).toDF("vec_id", "embedding")

  test("cosineTopK ranks by cosine with deterministic tie-break") {
    val out = Similarity.cosineTopK(vecs, vecs.filter(col("vec_id") === 0),
      "vec_id", "embedding", dim = 4, k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out.head.getAs[Double]("cos_sim") > 0.99)
    assert(out.last.getAs[Double]("cos_sim") == -1.0)
  }

  test("TopKAggregator path equals the window-function top-k exactly") {
    val win = Similarity.cosineTopK(vecs, vecs.filter(col("vec_id") < 2),
      "vec_id", "embedding", dim = 4, k = 2).orderBy("query_id", "rank").collect()
    val agg = Similarity.cosineTopKAgg(vecs, vecs.filter(col("vec_id") < 2),
      "vec_id", "embedding", dim = 4, k = 2).orderBy("query_id", "rank").collect()
    assert(win.map(_.toSeq).toSeq == agg.map(_.toSeq).toSeq)
  }

  test("IVF top-k recall vs brute force is high at nprobe/nlist = 1/4") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, q, "vec_id", "embedding", 64, 5))
    val ivf = pairs(Similarity.ivfTopK(emb, q, "vec_id", "embedding", 64, 5,
      nlist = 16, nprobe = 4))
    assert(exact.nonEmpty)
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall $recall")
  }

  test("JL-projected top-k recall rises with the rerank pool") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, q, "vec_id", "embedding", 64, 5))
    assert(exact.nonEmpty)
    val recalls = Seq(20, 60, 120).map { rr =>
      val jl = pairs(Similarity.jlTopK(emb, q, "vec_id", "embedding", 64,
        r = 16, k = 5, rerank = rr))
      (exact & jl).size.toDouble / exact.size
    }
    info(s"JL recall@5 by rerank 20/60/120: ${recalls.mkString(", ")}")
    assert(recalls.last >= recalls.head,
      s"recall should not degrade with a deeper pool: $recalls")
    assert(recalls.last >= 0.6, s"JL recall ${recalls.last} at rerank=120")
  }

  test("k-means-trained IVF beats first-id seeding at equal nlist/nprobe") {
    // sf0.01 planted near-dup corpus (500 vecs). Queries must be DISJOINT
    // from the first-nlist ids: a query that IS a seed centroid gets its
    // own Voronoi cell — precisely its top-cosine candidates — which
    // inflates seeded recall artificially (0.92 vs 0.40 here). On fair
    // queries the learned centroids win because near-dup partners
    // co-cluster while arbitrary seed points split them.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val q = emb.filter(col("vec_id") >= 100 && col("vec_id") < 110)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, q, "vec_id", "embedding", 64, 5))
    assert(exact.nonEmpty)
    val seeded = pairs(Similarity.ivfTopK(emb, q, "vec_id", "embedding", 64, 5,
      nlist = 16, nprobe = 4))
    val trained = pairs(Similarity.ivfKMeansTopK(emb, q, "vec_id", "embedding",
      64, 5, nlist = 16, iters = 2, nprobe = 4))
    val rSeeded = (exact & seeded).size.toDouble / exact.size
    val rTrained = (exact & trained).size.toDouble / exact.size
    info(s"recall@5: seeded=$rSeeded trained=$rTrained")
    assert(rTrained > rSeeded,
      s"trained recall $rTrained not better than seeded $rSeeded")
  }

  test("LSH top-k recall improves with probe radius; radius 2 is usable") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, q, "vec_id", "embedding", 64, 5))
    val recalls = Seq(0, 1, 2).map { r =>
      val approx = pairs(Similarity.lshTopK(emb, q, "vec_id", "embedding", 64, 5,
        numPlanes = 4, probeRadius = r))
      (exact & approx).size.toDouble / exact.size
    }
    assert(recalls(0) <= recalls(1) && recalls(1) <= recalls(2), s"curve $recalls")
    assert(recalls(2) >= 0.7, s"radius-2 recall too low: $recalls")
  }

  test("IVF recall improves monotonically with nprobe") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.cosineTopK(emb, q, "vec_id", "embedding", 64, 5))
    val recalls = Seq(1, 4, 16).map { np =>
      val approx = pairs(Similarity.ivfTopK(emb, q, "vec_id", "embedding", 64, 5,
        nlist = 16, nprobe = np))
      (exact & approx).size.toDouble / exact.size
    }
    assert(recalls(0) <= recalls(1) && recalls(1) <= recalls(2),
      s"recall curve $recalls")
    assert(recalls(2) == 1.0, s"nprobe=nlist must be exhaustive: $recalls")
  }

  test("quantized top-k: high recall vs brute force; returned sims are exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val exactDf = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 64, 5)
    val quantDf = Similarity.quantizedTopK(emb, q, "vec_id", "embedding", 64, 5,
      rerank = 20)
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = exactDf.collect()
    val quant = quantDf.collect()
    val recall = (pairs(exact) & pairs(quant)).size.toDouble / exact.length
    info(s"int8 recall@5 (rerank=20): $recall")
    assert(recall >= 0.9, s"int8+rerank recall too low: $recall")
    // every returned similarity must be the EXACT float cosine (the rerank
    // stage recomputes on the original vectors — quantization error may
    // cost recall but never precision of what IS returned)
    val exactSims = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    quant.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactSims.get(key).foreach(s => assert(s == r.getDouble(2), s"$key"))
    }
  }

  test("PQ top-k: usable recall vs brute force at 32x compression; sims exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val exactDf = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 64, 5)
    val pqDf = Similarity.pqTopK(emb, q, "vec_id", "embedding", 64,
      m = 8, ksub = 16, iters = 2, k = 5, rerank = 20)
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = exactDf.collect()
    val pq = pqDf.collect()
    val recall = (pairs(exact) & pairs(pq)).size.toDouble / exact.length
    info(s"pq recall@5 (m=8, ksub=16, rerank=20): $recall")
    // 4 codes stand in for 64 floats — far lossier than int8 (e10), so the
    // bar is "usable candidates", not e10's 0.9; rerank keeps sims exact
    assert(recall >= 0.5, s"pq+rerank recall too low: $recall")
    val exactSims = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    pq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactSims.get(key).foreach(s => assert(s == r.getDouble(2), s"$key"))
    }
  }

  test("IVF-PQ: candidates from probed lists only; recall bounded by its parts; sims exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(emb, q, "vec_id", "embedding", 64, 5).collect()
    val ivfpq = Similarity.ivfPqTopK(emb, q, "vec_id", "embedding", 64,
      k = 5, nlist = 16, itersCoarse = 2, nprobe = 4, m = 8, ksub = 16,
      itersPq = 2, rerank = 20).collect()
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pairs(exact) & pairs(ivfpq)).size.toDouble / exact.length
    info(s"ivf-pq recall@5 (nlist=16 nprobe=4, m=8 ksub=16, rerank=20): $recall")
    assert(recall >= 0.3, s"ivf-pq recall too low: $recall") // both levers lossy; rerank exact
    // whatever IS returned carries the exact float cosine
    val exactSims = exact.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivfpq.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      exactSims.get(key).foreach(s => assert(s == r.getDouble(2), s"$key"))
    }
    // the candidate bound holds: no query returns more than k rows, ranks 1..k dense
    val byQ = ivfpq.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      assert(rows.length <= 5)
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
    }
  }

  test("QuantizeI8/DotProductI8 match the reference integer computation") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)(Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    def ref(a: Array[Float], b: Array[Float]): Long = {
      def qz(x: Float): Long =
        math.max(-127L, math.min(127L, math.floor(x.toDouble * 127.0 + 0.5).toLong))
      a.zip(b).map { case (x, y) => qz(x) * qz(y) }.sum
    }
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "vec")
    val got = df.as("a").join(df.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        graft.plans.DotProductI8(
          graft.plans.QuantizeI8(col("a.vec")),
          graft.plans.QuantizeI8(col("b.vec"))).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (i <- rows.indices; j <- rows.indices if i < j)
      assert(got((i.toLong, j.toLong)) == ref(rows(i), rows(j)), s"($i,$j)")
  }

  test("cosineNearDupPairs respects the threshold") {
    val pairs = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding", 4, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("q33 statistical moments agree with exact definitions within tolerance") {
    val got = graft.SparkEntry.queries("q33_stats_moments")(spark, "/root/testdata/sf0.001")
      .filter(col("l_returnflag") === "N").head()
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_returnflag") === "N")
      .select(col("l_quantity").cast("double").as("q"),
        col("l_extendedprice").cast("double").as("p"),
        col("l_discount").cast("double").as("d")).collect()
    val (qs, ps) = (li.map(_.getDouble(0)), li.map(_.getDouble(1)))
    val ds = li.map(_.getDouble(2))
    val n = qs.length.toDouble
    val mq = qs.sum / n
    val sd = math.sqrt(qs.map(x => (x - mq) * (x - mq)).sum / (n - 1))
    assert(math.abs(got.getAs[Double]("sd_qty") - sd) / sd < 1e-9)
    val mp = ps.sum / n
    val cov = qs.zip(ps).map { case (x, y) => (x - mq) * (y - mp) }.sum / (n - 1)
    val sdp = math.sqrt(ps.map(x => (x - mp) * (x - mp)).sum / (n - 1))
    val corrExact = cov / (sd * sdp)
    assert(math.abs(got.getAs[Double]("corr_qty_price") - corrExact) < 1e-9)
    // skewness: population m3 / m2^1.5 (Spark's skewness definition)
    val md = ds.sum / n
    val m2 = ds.map(x => (x - md) * (x - md)).sum / n
    val m3 = ds.map(x => (x - md) * (x - md) * (x - md)).sum / n
    val skewExact = m3 / (m2 * math.sqrt(m2))
    assert(math.abs(got.getAs[Double]("skew_disc") - skewExact) < 1e-6,
      s"skew ${got.getAs[Double]("skew_disc")} vs $skewExact")
    // the built-in one-pass aggregates (the §2.4 surface itself) agree too
    val builtin = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_returnflag") === "N")
      .agg(stddev_samp(col("l_quantity")).as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        skewness(col("l_discount")).as("sk")).head()
    assert(math.abs(builtin.getAs[Double]("sd") - sd) / sd < 1e-6)
    assert(math.abs(builtin.getAs[Double]("c") - corrExact) < 1e-6)
    assert(math.abs(builtin.getAs[Double]("sk") - skewExact) < 1e-6)
  }

  test("Quantiles.exactQuantile matches the percentile aggregate bit-for-bit") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    for (p <- Seq(0.0, 0.37, 0.5, 0.9, 1.0)) {
      val agg = part.agg(expr(s"percentile(p_retailprice, $p)")).head().getDouble(0)
      val got = graft.operators.Quantiles.exactQuantile(part, "p_retailprice", p)
      assert(got == agg, s"p=$p: $got != $agg")
    }
  }

  test("q24 KMV estimate and approx_count_distinct are close to exact") {
    val q = graft.SparkEntry.queries("q24_approx_distinct_parts")(spark, "/root/testdata/sf0.001")
    val exact = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"),
        approx_count_distinct(col("l_partkey")).as("hll"))
    val joined = q.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val est = r.getAs[Double]("est_parts")
      val ex = r.getAs[Long]("exact").toDouble
      // sf0.001 has < 1024 distinct parts per flag → KMV is its exact branch
      // (modulo astronomically unlikely 32-bit collisions)
      assert(math.abs(est - ex) / ex < 0.01, s"KMV $est vs exact $ex")
      val hll = r.getAs[Long]("hll").toDouble
      assert(math.abs(hll - ex) / ex < 0.05, s"HLL $hll vs exact $ex")
    }
  }

  val ordersT = Seq(
    (10L, 100L, "2024-01-01 00:00:00", 5.0),
    (11L, 100L, "2024-01-10 00:00:00", 7.0),
    (12L, 100L, "2024-01-10 00:00:00", 9.0), // same time as 11 → tiebreak: max orderkey wins
    (13L, 200L, "2024-06-01 00:00:00", 1.0),
  ).toDF("o_orderkey", "o_custkey", "o_ts", "o_price")
    .withColumn("o_ts", col("o_ts").cast("timestamp"))

  val eventsT = Seq(
    (1L, 100L, "2024-01-05 00:00:00"), // after order 10 only
    (2L, 100L, "2024-01-10 00:00:00"), // ties at order 11/12 time → 12 (<= incl., max key)
    (3L, 100L, "2024-02-01 00:00:00"), // after all → 12
    (4L, 200L, "2024-01-01 00:00:00"), // before any 200-order → null
    (5L, 999L, "2024-01-01 00:00:00"), // key with no orders → null
  ).toDF("event_id", "user_id", "ts")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("asof backward join: <= semantics, tiebreak, and no-match nulls") {
    val out = AsOfJoin.backward(eventsT, ordersT,
      "user_id", "o_custkey", "ts", "o_ts", Seq("o_orderkey", "o_price"), "o_orderkey")
      .orderBy("event_id").collect()
    val keys = out.map(r => Option(r.getAs[java.lang.Long]("o_orderkey")).map(_.toLong))
    assert(keys.toSeq == Seq(Some(10L), Some(12L), Some(12L), None, None))
    assert(out(1).getAs[Double]("o_price") == 9.0)
  }

  test("asof forward join: >= semantics, min-tiebreak, and no-match nulls") {
    val out = AsOfJoin.forward(eventsT, ordersT,
      "user_id", "o_custkey", "ts", "o_ts", Seq("o_orderkey", "o_price"), "o_orderkey")
      .orderBy("event_id").collect()
    val keys = out.map(r => Option(r.getAs[java.lang.Long]("o_orderkey")).map(_.toLong))
    // event 1 (Jan 5) → next is the Jan 10 pair, MIN key 11 wins;
    // event 2 ties exactly at Jan 10 (>= includes it) → 11;
    // event 3 (Feb 1) is after every 100-order → null;
    // event 4 (Jan 1, key 200) → order 13 in June; event 5: no such key.
    assert(keys.toSeq == Seq(Some(11L), Some(11L), None, Some(13L), None))
  }

  test("asof joins: NULL event times on either side never match") {
    // NULL left time: comparison is NULL in SQL → no match, even though
    // nulls-first sort order would otherwise hand forward() the whole key
    // history. NULL right time: must not leak into any window.
    val lNull = Seq((9L, 100L, null.asInstanceOf[String]))
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
    val rNull = Seq((99L, 100L, null.asInstanceOf[String], 42.0))
      .toDF("o_orderkey", "o_custkey", "o_ts", "o_price")
      .withColumn("o_ts", col("o_ts").cast("timestamp"))
    for (dir <- Seq("backward", "forward")) {
      val join = if (dir == "backward") AsOfJoin.backward _ else AsOfJoin.forward _
      val out = join(eventsT.union(lNull), ordersT.union(rNull),
        "user_id", "o_custkey", "ts", "o_ts", Seq("o_orderkey", "o_price"),
        "o_orderkey").collect()
      val nullTs = out.filter(_.isNullAt(2))
      assert(nullTs.length == 1 && nullTs.head.isNullAt(3),
        s"$dir: NULL-time left row must stay unmatched")
      assert(!out.exists(r => !r.isNullAt(3) && r.getLong(3) == 99L),
        s"$dir: NULL-time right row must never be a match")
    }
  }

  test("BottomKSketch matches sort-based rank-k over distinct values") {
    import graft.operators.BottomKSketch
    val rnd = new scala.util.Random(42)
    val k = 16
    // three groups: below k, exactly k, well above k distinct values
    val groups = Map(
      "small" -> Seq.fill(k - 3)(rnd.nextLong()).distinct,
      "exact" -> Seq.fill(k * 3)(rnd.nextLong()).distinct.take(k),
      "big"   -> Seq.fill(k * 20)(rnd.nextLong()).distinct)
    val rows = groups.toSeq.flatMap { case (g, vs) => vs.map(g -> _) }
    val out = spark.createDataset(rows).as[(String, Long)]
      .repartition(8) // force multi-partition partial buffers + merges
      .groupByKey(_._1).mapValues(_._2)
      .agg(new BottomKSketch(k).toColumn.name("kmv"))
      .collect().toMap
    for ((g, vs) <- groups) {
      val (n, kth) = out(g)
      assert(n == vs.size, s"$g count")
      val expected = if (vs.size >= k) Some(vs.sorted.apply(k - 1)) else None
      assert(kth == expected, s"$g kth")
    }
  }

  test("SpaceSaving: exact when capacity covers the vocabulary, bounded when not") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // zipf-ish stream: value i drawn with weight ~ 1/(i+1)
    val weights = (0 until 50).map(i => 1.0 / (i + 1))
    val total = weights.sum
    def draw(): Int = {
      var x = rnd.nextDouble() * total
      var i = 0
      while (x > weights(i)) { x -= weights(i); i += 1 }
      i
    }
    val stream = Seq.fill(20000)(s"v${draw()}")
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ds = stream.toDS().repartition(8) // force partial buffers + merges

    // exact regime: capacity >= distinct values -> zero error, true counts
    val exact = ds.select(new SpaceSavingSketch(64, 10).toColumn).toDF("hh")
      .select(explode(col("hh")).as("e")).select("e._1", "e._2", "e._3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    exact.foreach { case (v, est, err) =>
      assert(err == 0L && est == truth(v), s"$v est=$est err=$err true=${truth(v)}")
    }

    // approx regime: capacity 8 << 50 distinct. SpaceSaving invariants:
    // est overestimates, est - err lower-bounds, and every item with
    // true count > 2N/capacity survives the merge-trim
    val approx = ds.select(new SpaceSavingSketch(8, 8).toColumn).toDF("hh")
      .select(explode(col("hh")).as("e")).select("e._1", "e._2", "e._3")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    approx.foreach { case (v, est, err) =>
      val t = truth.getOrElse(v, 0L)
      assert(est >= t, s"$v est=$est under true=$t")
      assert(est - err <= t, s"$v lower bound ${est - err} above true=$t")
    }
    val surviving = approx.map(_._1).toSet
    val mustSurvive = truth.filter(_._2 > 2L * stream.size / 8).keySet
    assert(mustSurvive.subsetOf(surviving),
      s"lost heavy hitters: ${mustSurvive -- surviving}")
  }

  test("incrementalDupPairs: cross pairs only — batch-internal dups stay invisible") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base),
      (2L, "totally different words about spark shuffles and joins here now"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, base + " lambda"), // near-dup of corpus doc 1
      (102L, "unrelated singleton content nothing matches this string at all"),
      // 103/104 duplicate EACH OTHER but nothing in the corpus
      (103L, "batch internal twin one two three four five six seven eight nine"),
      (104L, "batch internal twin one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val pairs = graft.operators.Dedup
      .incrementalDupPairs(corpus, batch, "doc_id", "text", 3, 12, 3, 0.5)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((101L, 1L)),
      pairs.mkString(", "))
    val j = pairs.head.getDouble(2)
    assert(j >= 0.5 && j <= 1.0, s"jaccard $j")
  }

  test("p06 approx percentiles land within rank tolerance of the exact twin") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_returnflag"), col("l_extendedprice"))
    val exact = graft.operators.Quantiles.groupedQuantileCont(
      li, "l_returnflag", "l_extendedprice",
      Seq(("p50", 0.5), ("p90", 0.9)))
      .select("l_returnflag", "p50", "p90")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(expr("approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)").as("a"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // accuracy 10000 → rank error <= n/10000; values must bracket within
    // a generous relative band on this distribution
    exact.foreach { case (k, (p50, p90)) =>
      assert(math.abs(approx(k)(0) - p50) / p50 < 0.02,
        s"$k p50 approx ${approx(k)(0)} vs exact $p50")
      assert(math.abs(approx(k)(1) - p90) / p90 < 0.02,
        s"$k p90 approx ${approx(k)(1)} vs exact $p90")
    }
  }

  test("mergeRollup: chained incremental merges equal the full recompute") {
    import spark.implicits._
    val rows = Seq.tabulate(30)(i => (s"k${i % 3}", i.toLong, BigDecimal(i) / 4))
      .toDF("k", "id", "v")
      .select(col("k"), col("id"), col("v").cast("decimal(18,2)").as("v"))
    def roll(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
    // Three daily batches folded one at a time, like foreachBatch would.
    val b = (0 until 3).map(d => roll(rows.filter(col("id") % 3 === d)))
    val inc = b.tail.foldLeft(b.head)((acc, delta) =>
      graft.ingest.Upsert.mergeRollup(acc, delta, Seq("k"), Seq("sv"), Seq("n")))
    val full = roll(rows)
    assert(inc.select("k", "n", "sv").orderBy("k").collect().toSeq ==
      full.select("k", "n", "sv").orderBy("k").collect().toSeq)
  }

  test("GraphRank.pagerank: hub outranks leaves; matches scalar replay exactly") {
    import spark.implicits._
    // Star 0-(1,2,3) plus the detached pair 4-5.
    val pairs = Seq((0L, 1L), (0L, 2L), (0L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val got = graft.operators.GraphRank.pagerank(pairs, "id_a", "id_b", iters = 3)
      .as[(Long, Long)].collect().toMap
    // Scalar replay of the documented integer recurrence.
    val S = graft.operators.GraphRank.Scale
    val adj = Map(0L -> Seq(1L, 2L, 3L), 1L -> Seq(0L), 2L -> Seq(0L),
      3L -> Seq(0L), 4L -> Seq(5L), 5L -> Seq(4L))
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val nn = adj.size.toLong
    var r = adj.keys.map(_ -> S / nn).toMap
    for (_ <- 1 to 3)
      r = adj.keys.map(v => v ->
        ((15L * S / 100) / nn +
          85L * adj(v).map(u => r(u) / deg(u)).sum / 100)).toMap
    assert(got == r, s"got $got expected $r")
    assert(got(0L) > got(1L) && got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L))
  }

  test("slidingChunks: full coverage, overlap arithmetic, clamped tail") {
    import spark.implicits._
    // 10 tokens, width 4, stride 3 -> starts 0,3,6,9; tail chunks clamp.
    val doc = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val out = graft.operators.Chunker
      .slidingChunks(doc, "doc_id", "text", width = 4, stride = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "chunk_len")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 4L), (3L, 9L, 1L)))
    // Every token index is inside at least one [start, start+len) window.
    val covered = out.flatMap { case (_, s0, len) => s0 until (s0 + len) }.toSet
    assert(covered == (0L until 10L).toSet)
    // stride == width degenerates to the disjoint chunker's row count.
    val disjoint = graft.operators.Chunker
      .slidingChunks(doc, "doc_id", "text", width = 4, stride = 4).count()
    assert(disjoint == graft.operators.Chunker
      .chunks(doc, "doc_id", "text", width = 4).count())
  }

  test("CountMin: never undercounts any token; tight width is exact here") {
    import spark.implicits._
    val corpus = Seq.tabulate(40)(i =>
      s"alpha beta gamma token$i alpha ${if (i % 2 == 0) "even" else "odd"}")
      .toDF("text")
    val toks = corpus.select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
    val truth = toks.groupBy("tok").count().as[(String, Long)].collect().toMap
    val sk = graft.operators.CountMin.sketch(toks, "tok", depth = 4, width = 512)
    val est = graft.operators.CountMin
      .estimate(sk, toks.distinct(), "tok", depth = 4, width = 512)
      .as[(String, Long)].collect().toMap
    assert(est.keySet == truth.keySet)
    truth.foreach { case (t, n) =>
      assert(est(t) >= n, s"undercount for $t: est ${est(t)} < true $n")
    }
  }

  test("CountMin.joinSizeEstimate: >= true join size, exact when collision-free") {
    import spark.implicits._
    // fA = {a:2, b:1, c:3}, fB = {a:1, c:2, d:5} → Σ fA·fB = 2·1 + 3·2 = 8
    val a = Seq("a", "a", "b", "c", "c", "c").toDF("tok")
    val b = Seq("a", "c", "c", "d", "d", "d", "d", "d").toDF("tok")
    def est(width: Int): Long = {
      val skA = graft.operators.CountMin.sketch(a, "tok", 4, width)
      val skB = graft.operators.CountMin.sketch(b, "tok", 4, width)
      graft.operators.CountMin.joinSizeEstimate(skA, skB)
        .head.getLong(0)
    }
    assert(est(4096) == 8L) // 4 keys in 4096 buckets: no collisions, exact
    assert(est(2) >= 8L)    // forced collisions may only overcount
  }

  test("CountMin.merge: per-shard sketches sum cellwise to the full sketch") {
    import spark.implicits._
    val a = Seq("x y z x", "y common words here").toDF("text")
    val b = Seq("x q r s t", "common again x y").toDF("text")
    def tk(df: org.apache.spark.sql.DataFrame) =
      df.select(explode(graft.functions.TextFns.tokens(col("text"))).as("tok"))
    val skA = graft.operators.CountMin.sketch(tk(a), "tok", 4, 64)
    val skB = graft.operators.CountMin.sketch(tk(b), "tok", 4, 64)
    val merged = graft.operators.CountMin.merge(skA, skB)
      .as[(Int, Long, Long)].collect().toSet
    val whole = graft.operators.CountMin.sketch(tk(a.union(b)), "tok", 4, 64)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("GapFill.denseLocf: global span, zero-filled flows, carried levels") {
    import spark.implicits._
    // key "a" observed on days 1 and 4; key "b" only on day 2. Global span
    // is [day1, day4], so both keys must emit 4 rows.
    val daily = Seq(
      ("a", "2024-01-01", 2L, 10.0),
      ("a", "2024-01-04", 1L, 40.0),
      ("b", "2024-01-02", 3L, 20.0))
      .toDF("k", "day", "n", "v")
      .select(col("k"), to_date(col("day")).as("day"), col("n"), col("v"))
    val out = graft.operators.GapFill.denseLocf(daily, "k", "day", "n", "v")
      .orderBy("k", "day")
      .select(col("k"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n"), col("v"), col("locf_v"), col("is_gap"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)), r.getBoolean(5)))
    assert(out.length == 8, out.mkString(", "))
    assert(out.toSeq == Seq(
      ("a", "2024-01-01", 2L, Some(10.0), Some(10.0), false),
      ("a", "2024-01-02", 0L, None, Some(10.0), true),
      ("a", "2024-01-03", 0L, None, Some(10.0), true),
      ("a", "2024-01-04", 1L, Some(40.0), Some(40.0), false),
      ("b", "2024-01-01", 0L, None, None, true), // before first obs: no carry
      ("b", "2024-01-02", 3L, Some(20.0), Some(20.0), false),
      ("b", "2024-01-03", 0L, None, Some(20.0), true),
      ("b", "2024-01-04", 0L, None, Some(20.0), true)))
  }

  test("GraphRank.triangles: clique vs chain, per-node counts and lcc") {
    import spark.implicits._
    // 4-clique {0,1,2,3} (every node: deg 3, tri C(3,2)=3, lcc=1) plus the
    // chain 10-11-12 (11: deg 2, 0 triangles, lcc 0; ends: deg 1).
    val clique = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val pairs = (clique ++ Seq((10L, 11L), (11L, 12L))).toDF("id_a", "id_b")
    val got = graft.operators.GraphRank.triangles(pairs, "id_a", "id_b")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    for (v <- 0L to 3L) assert(got(v) == (v, 3L, 3L, 10000L), got(v))
    assert(got(11L) == (11L, 2L, 0L, 0L))
    assert(got(10L) == (10L, 1L, 0L, 0L) && got(12L) == (12L, 1L, 0L, 0L))
    assert(got.size == 7)
  }

  test("Quality.audit: counts injected violations per check") {
    import spark.implicits._
    val orders = Seq(
      (1L, Some(1L), "O", 50000.0),   // clean
      (1L, Some(2L), "F", 150000.0),  // dup key + over-100k
      (2L, None, "X", 99999.0)        // null custkey + bad status
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val lineitem = Seq(
      (1L, 0.05, 10.0),  // clean
      (1L, 1.5, 0.0),    // bad discount + non-positive qty
      (9L, -0.1, 5.0)    // orphan key + bad discount
    ).toDF("l_orderkey", "l_discount", "l_quantity")
    val got = graft.operators.Quality.audit(orders, lineitem)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("orders.o_orderkey.unique") == ((1L, 3L)))
    assert(got("orders.o_custkey.not_null") == ((1L, 3L)))
    assert(got("orders.o_orderstatus.in_O_F_P") == ((1L, 3L)))
    assert(got("orders.o_totalprice.le_100k") == ((1L, 3L)))
    assert(got("lineitem.l_discount.in_0_1") == ((2L, 3L)))
    assert(got("lineitem.l_quantity.positive") == ((1L, 3L)))
    assert(got("lineitem.l_orderkey.fk_orders") == ((1L, 3L)))
    assert(got.size == 7)
  }

  test("PrepPipeline.funnel: each stage claims its doc, labels exclusive") {
    import spark.implicits._
    def words(p: String) = (0 until 40).map(p + _).mkString(" ")
    val docs = Seq(
      (1L, words("e")),   // eval slice (id < 50)
      (100L, words("c")), // clean -> kept
      (101L, "a b c"),    // short -> gate
      (110L, words("d")), // dup pair, lower id kept
      (111L, words("d")), // dup pair, higher id dropped
      (120L, words("e"))  // copies the eval doc -> contaminated
    ).toDF("doc_id", "text")
    val got = graft.operators.PrepPipeline.funnel(docs, "doc_id", "text",
        evalBelow = 50L, minTokens = 30, n = 3, numHashes = 12,
        rowsPerBand = 3, threshold = 0.8, contamFrac = 0.5,
        trainFrac = 0.8, validFrac = 0.1)
      .as[(String, Long)].collect().toMap
    assert(got("10_dropped_gate") == 1L, got)
    assert(got("20_dropped_dup") == 1L, got)
    assert(got("30_dropped_contaminated") == 1L, got)
    assert(got.filter(_._1.startsWith("40_kept_")).values.sum == 2L, got)
    assert(got.values.sum == 5L, got) // eval doc is not a corpus row
  }

  test("mmrTopK: skips the near-duplicate plain top-k keeps") {
    import spark.implicits._
    // q=(1,0,0,0); a and b are near-identical top hits; c is less relevant
    // but diverse. Plain top-2 = {a, b}; MMR (λ=0.5) must pick {a, c}.
    val corpus = Seq(
      (100L, Array(0.99f, 0.10f, 0f, 0f)), // a
      (101L, Array(0.99f, 0.11f, 0f, 0f)), // b ~ a
      (102L, Array(0.70f, 0f, 0.70f, 0f))  // c: diverse
    ).toDF("id", "vec")
    val queries = Seq((1L, Array(1f, 0f, 0f, 0f))).toDF("id", "vec")
    val plain = graft.operators.Similarity.cosineTopK(
        corpus, queries, "id", "vec", dim = 4, k = 2, excludeSelf = false)
      .select("neighbor_id").as[Long].collect().toSet
    assert(plain == Set(100L, 101L))
    val mmr = graft.operators.Similarity.mmrTopK(
        corpus, queries, "id", "vec", dim = 4, cands = 3, k = 2, lambda = 0.5)
      .orderBy("mmr_rank")
      .select("neighbor_id").as[Long].collect().toSeq
    assert(mmr == Seq(100L, 102L), mmr)
  }

  test("OHLC bars: open/close picked by event order, VWAP exact") {
    import spark.implicits._
    // One brand-month with a known event sequence: prices 10, 30, 20 in
    // order -> open 10, high 30, low 10, close 20; VWAP = Σ(p·q)/Σq.
    val rows = Seq(
      (1L, 1, "2024-01-03", 10.0, 1.0), // ord smallest: open
      (2L, 1, "2024-01-05", 60.0, 2.0), // price 30
      (3L, 1, "2024-01-07", 40.0, 2.0)  // ord largest: close, price 20
    ).toDF("l_orderkey", "l_linenumber", "ship", "l_extendedprice", "l_quantity")
    val priced = rows.select(
      lit("B").as("brand"), lit("2024-01").as("month"),
      (col("l_extendedprice") / col("l_quantity")).as("price"),
      (unix_date(to_date(col("ship"))).cast("long") * 1000000000000L
        + col("l_orderkey") * 10 + col("l_linenumber")).as("ord"),
      col("l_extendedprice").cast("decimal(18,2)").as("val_d"),
      col("l_quantity").cast("decimal(18,2)").as("qty_d"))
    val bar = priced.groupBy("brand", "month").agg(
      min_by(col("price"), col("ord")).as("open_p"),
      max(col("price")).as("high_p"), min(col("price")).as("low_p"),
      max_by(col("price"), col("ord")).as("close_p"),
      (sum(col("val_d")).cast("double") / sum(col("qty_d")).cast("double"))
        .as("vwap"),
      count(lit(1)).as("n"))
      .as[(String, String, Double, Double, Double, Double, Double, Long)]
      .head()
    assert(bar == (("B", "2024-01", 10.0, 30.0, 10.0, 20.0, 110.0 / 5.0, 3L)))
  }
  test("GraphRank.labelProp splits bridge-joined cliques that stay one component") {
    import spark.implicits._
    // two triangles {1,2,3} and {4,5,6} joined by the bridge 3-4: one
    // connected component, but label propagation separates the cliques
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("id_a", "id_b")
    val got = graft.operators.GraphRank.labelProp(pairs, "id_a", "id_b", iters = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val byNode = got.map(r => r._1 -> r._2).toMap
    assert(Set(1L, 2L, 3L).map(byNode) == Set(1L),
      s"left clique should converge to label 1, got $byNode")
    assert(Set(4L, 5L, 6L).map(byNode) == Set(3L),
      s"right clique should converge to label 3, got $byNode")
    assert(got.forall(_._3 == 3L), "both communities have size 3")
  }

  test("GraphRank.bfsDepths: min-hop depths, radius bound, unreachable absent") {
    import spark.implicits._
    // chain 1-2-3-4-5 plus a shortcut 1-3 (min-depth must win) and an
    // isolated edge 8-9 (unreachable from the seed)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L),
      (8L, 9L)).toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("id")
    val got = graft.operators.GraphRank.bfsDepths(pairs, "id_a", "id_b",
        seeds, "id", maxDepth = 2)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    // maxDepth = 0 returns exactly the seed set
    val onlySeeds = graft.operators.GraphRank.bfsDepths(pairs, "id_a", "id_b",
        seeds, "id", maxDepth = 0)
      .as[(Long, Int)].collect().toMap
    assert(onlySeeds == Map(1L -> 0))
  }
}
