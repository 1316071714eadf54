package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Chunker, Dedup, SpanDedup}
import graft.util.Tables

/** Deduplication queries over `documents` — each Dedup operator declared
  * with its DuckDB oracle (identical md5-based computation in both engines).
  */
object DedupQueries {

  private val N = 3 // shingle width (word trigrams)
  private val NumHashes = 12
  private val RowsPerBand = 3
  private val LshThreshold = 0.8
  private val JaccardThreshold = 0.6
  private val ContainmentThreshold = 0.9

  val all: Seq[Q] = Seq(
    Q("d01_exact_dup_groups",
      (s, dir) => Dedup.exactDupGroups(Tables(s, dir).documents, "doc_id", "text"),
      Some(Dedup.exactDupGroupsSql("documents", "doc_id", "text"))),

    Q("d02_fingerprint_dups",
      (s, dir) => Dedup.fingerprintDupGroups(Tables(s, dir).documents, "doc_id", "text"),
      Some(Dedup.fingerprintDupGroupsSql("documents", "doc_id", "text"))),

    Q("d03_ngram_jaccard_pairs",
      (s, dir) => Dedup.ngramJaccardPairs(Tables(s, dir).documents,
        "doc_id", "text", N, JaccardThreshold),
      Some(Dedup.ngramJaccardPairsSql("documents", "doc_id", "text", N, JaccardThreshold))),

    Q("d04_minhash_lsh_pairs",
      (s, dir) => Dedup.minhashLshPairs(Tables(s, dir).documents,
        "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold),
      Some(Dedup.minhashLshPairsSql("documents", "doc_id", "text",
        N, NumHashes, RowsPerBand, LshThreshold))),

    // Prefix-filtering (PPJoin-style) exact Jaccard — provably identical
    // output to d03, so it shares d03's oracle; the prefix index shrinks
    // the candidate join.
    Q("d07_jaccard_prefix_filter",
      (s, dir) => Dedup.ngramJaccardPairsPrefix(Tables(s, dir).documents,
        "doc_id", "text", N, JaccardThreshold),
      Some(Dedup.ngramJaccardPairsSql("documents", "doc_id", "text", N, JaccardThreshold))),

    // The end-user cleaning op: corpus minus near-duplicates (keep-first).
    Q("d06_drop_near_duplicates",
      (s, dir) => Dedup.dropNearDuplicates(Tables(s, dir).documents,
          "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold)
        .select("doc_id"),
      Some(Dedup.dropNearDuplicatesSql("documents", "doc_id", "text",
        N, NumHashes, RowsPerBand, LshThreshold))),

    Q("d05_simhash",
      (s, dir) => Dedup.simhash(Tables(s, dir).documents, "doc_id", "text", 16),
      Some(Dedup.simhashSql("documents", "doc_id", "text", 16))),

    // Transitive duplicate clusters: connected components over the LSH
    // near-dup pair graph via min-label propagation to fixpoint; the oracle
    // computes the same fixpoint with a recursive CTE.
    Q("d08_dup_clusters",
      (s, dir) => Dedup.dupClusters(Tables(s, dir).documents,
        "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold),
      Some(Dedup.dupClustersSql("documents", "doc_id", "text",
        N, NumHashes, RowsPerBand, LshThreshold))),

    // Chunk-level (paragraph-analog) dedup stats: share of each document's
    // 20-word chunks that also occur in other documents — the
    // boilerplate-removal signal (repeated headers/licence blocks).
    Q("d09_chunk_dup_stats",
      (s, dir) => Chunker.dupChunkStats(Tables(s, dir).documents,
        "doc_id", "text", 20),
      Some(Chunker.dupChunkStatsSql("documents", "doc_id", "text", 20))),

    // Exact substring-level dedup: maximal repeated 8-token spans at
    // ARBITRARY offsets (sorted n-gram-run formulation — linear, sort/
    // hash-based, no all-pairs; d09's fixed-width chunks are the coarse
    // approximation). SpanDedup.stripDupSpans is the remover built on it.
    Q("d10_dup_spans",
      (s, dir) => SpanDedup.dupSpans(Tables(s, dir).documents,
        "doc_id", "text", width = 8),
      Some(SpanDedup.dupSpansSql("documents", "doc_id", "text", width = 8))),

    // Provenance rollup of the dedup campaign: which sources duplicate
    // which (near-dup pairs bucketed by the two docs' source columns).
    Q("d11_cross_source_dups",
      (s, dir) => Dedup.crossSourceDupMatrix(Tables(s, dir).documents,
        "doc_id", "text", "source", N, NumHashes, RowsPerBand, LshThreshold),
      Some(Dedup.crossSourceDupMatrixSql("documents", "doc_id", "text",
        "source", N, NumHashes, RowsPerBand, LshThreshold))),

    // INCREMENTAL dedup: today's batch (every 5th doc id) against the
    // accumulated corpus (the rest) — batch-side bands join corpus-side
    // bands, no self-join anywhere; the daily-ingest shape where the
    // corpus's signature index is precomputed and the per-batch cost is
    // linear in batch size.
    Q("d12_incremental_dups",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        Dedup.incrementalDupPairs(
          docs.filter(col("doc_id") % 5 =!= 0),
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold)
      },
      Some(Dedup.incrementalDupPairsSql(
        "(SELECT * FROM documents WHERE doc_id % 5 <> 0)",
        "(SELECT * FROM documents WHERE doc_id % 5 = 0)",
        "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold))),

    // The PERSISTED MinHash band index (d30): d12's incremental admit
    // against a pre-built BUCKETED corpus band index — the text-side d29.
    // incrementalDupPairs recomputes the corpus's minhash signatures and
    // reshuffles its band relation on EVERY batch (O(corpus) per call);
    // here the corpus's bands are computed once, landed bucketed by the
    // packed xxhash64(band, sig) key, and the per-batch probe moves only
    // the batch's bands — the index scan is bucket-aligned in place
    // (zero corpus-side exchanges, spec-asserted), and verification
    // semi-join-prunes the corpus to candidate ids before shingling.
    // Identical semantics to d12, same oracle.
    Q("d30_incremental_dups_probe",
      (s, dir) => {
        val docs = Tables(s, dir).documents
        val corpus = docs.filter(col("doc_id") % 5 =!= 0)
        val idxTab = s"g_doc_minhash_bandidx_${LayoutQueries.tag(dir)}"
        LayoutQueries.ensureTable(s, idxTab)(graft.util.Layout.writeBucketed(
          Dedup.minhashBandIndex(corpus, "doc_id", "text",
            N, NumHashes, RowsPerBand).repartition(8, col("bk")),
          idxTab, "bk", 8, Some("bk")))
        Dedup.incrementalDupPairsProbe(s.table(idxTab), corpus,
          docs.filter(col("doc_id") % 5 === 0),
          "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold)
      },
      Some(Dedup.incrementalDupPairsSql(
        "(SELECT * FROM documents WHERE doc_id % 5 <> 0)",
        "(SELECT * FROM documents WHERE doc_id % 5 = 0)",
        "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold))),

    // Directional containment: a short doc pasted whole into a longer one
    // scores containment ~1 while symmetric Jaccard stays low — the pairs
    // d03/d04 are structurally blind to.
    Q("d13_containment_pairs",
      (s, dir) => Dedup.containmentPairs(Tables(s, dir).documents,
        "doc_id", "text", N, ContainmentThreshold),
      Some(Dedup.containmentPairsSql("documents", "doc_id", "text",
        N, ContainmentThreshold))),

    // Leakage-safe split: hash the dup-CLUSTER label, not the doc id, so
    // near-duplicates never straddle the train/eval boundary.
    Q("d14_cluster_safe_split",
      (s, dir) => Dedup.clusterSafeSplit(Tables(s, dir).documents,
        "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold, 0.8, 0.1),
      Some(Dedup.clusterSafeSplitSql("documents", "doc_id", "text",
        N, NumHashes, RowsPerBand, LshThreshold, 0.8, 0.1))),

    // Quality-aware canonical selection: keep the most complete (highest
    // token count) member of each dup cluster, not the lowest id.
    Q("d15_keep_best_in_cluster",
      (s, dir) => Dedup.keepBestInCluster(Tables(s, dir).documents,
        "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold),
      Some(Dedup.keepBestInClusterSql("documents", "doc_id", "text",
        N, NumHashes, RowsPerBand, LshThreshold))),

    // Structural canonical-selection signal (operators/GraphRank): exact
    // integer PageRank over the LSH near-dup pair graph (d08's relation —
    // the linear bucketed build, like d24; the guarded exact-quadratic
    // d03 form would trip its maxRows guard past 100k docs and its
    // inverted-index oracle replay exceeds DuckDB temp disk at sf1) — the
    // doc most densely connected to its variants (the hub they derive
    // from) ranks highest. d15 canonicalizes by a quality COLUMN; this is
    // the no-metadata alternative. Scaled-BIGINT truncating arithmetic
    // makes every rank bit-identical to the oracle's unrolled-CTE replay.
    Q("d16_pagerank_centrality",
      (s, dir) => graft.operators.GraphRank.pagerank(
        Dedup.minhashLshPairs(Tables(s, dir).documents,
          "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold),
        "id_a", "id_b", iters = 3),
      Some(graft.operators.GraphRank.pagerankSql(
        Dedup.minhashLshPairsSql("documents", "doc_id", "text",
          N, NumHashes, RowsPerBand, LshThreshold), iters = 3))),

    // Neighborhood SHAPE over the same near-dup graph: per-node triangle
    // count and integer-exact local clustering coefficient. Template
    // families (one source, many shallow edits) are near-cliques
    // (lcc_bp→10000); chained drift (A~B~C, A!~C) scores 0 — tells
    // "one doc, many edits" apart from "gradual mutation chain", which
    // rank (d16) and cluster size (d08) both conflate.
    // (Rides the LSH pair relation like d16/d24 — linear build, DuckDB-
    // tractable replay.)
    Q("d17_triangle_lcc",
      (s, dir) => graft.operators.GraphRank.triangles(
        Dedup.minhashLshPairs(Tables(s, dir).documents,
          "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold),
        "id_a", "id_b"),
      Some(graft.operators.GraphRank.trianglesSql(
        Dedup.minhashLshPairsSql("documents", "doc_id", "text",
          N, NumHashes, RowsPerBand, LshThreshold)))),

    // URL-level dedup — the FIRST pass of a web-corpus pipeline (cheaper
    // than any content hash): canonicalize each doc's URL (t17's
    // normalizer: case, default port, tracking params, fragment, param
    // order) and keep the best doc per canonical URL (max token count, id
    // tiebreak). Synthetic URLs collapse (doc_id%50, lang) groups onto one
    // canonical target through per-doc tracking-param noise. One hash
    // shuffle on the canonical URL — linear, the same shape at any scale.
    // LSH tuning harness: band recall + verify precision of d04's detector
    // vs exact Jaccard truth at the same 0.8 threshold — the d-series twin
    // of e14. The exact side is the guarded quadratic, so the declared
    // query follows the operator's own run-on-a-sample contract with a
    // deterministic id window: the whole corpus at sf0.01 (ids < 500) and
    // a bounded 2000-doc subcorpus at any larger scale — tuning numbers
    // come from a sample by design, never a corpus-wide quadratic.
    Q("d20_lsh_eval",
      (s, dir) => Dedup.lshEval(
        Tables(s, dir).documents.filter(col("doc_id") < 2000),
        "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold),
      Some(Dedup.lshEvalSql("(SELECT * FROM documents WHERE doc_id < 2000)",
        "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold))),

    // SOFT dedup — duplicate-count downweighting: weight = 1/|dup cluster|
    // so an m-times-duplicated passage contributes total mass 1 to the
    // training mix instead of being dropped. Cluster-size agg joins back on
    // the same key (exchange reuse); linear at any scale.
    Q("d19_dup_weights",
      (s, dir) => Dedup.dupWeights(Tables(s, dir).documents,
        "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold),
      Some(Dedup.dupWeightsSql("documents", "doc_id", "text",
        N, NumHashes, RowsPerBand, LshThreshold))),

    Q("d18_url_dedup",
      (s, dir) => {
        import graft.functions.{TextFns, UrlFns}
        val t = Tables(s, dir)
        val url = concat(lit("HTTPS://WWW.Example.com:443/page/"),
          (col("doc_id") % 50).cast("string"),
          lit("?utm_source=s"), col("doc_id").cast("string"),
          lit("&ref="), col("lang"), lit("#top"))
        val canon = UrlFns.normalizeUrl(url)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("canon"))
          .orderBy(col("n_tokens").desc, col("doc_id").asc)
        t.documents
          .select(col("doc_id"), canon.as("canon"),
            TextFns.tokenCount(col("text")).as("n_tokens"))
          .withColumn("_rn", row_number().over(w))
          .withColumn("n_dups", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("canon"))))
          .filter(col("_rn") === 1)
          .select(col("canon"), col("doc_id").as("kept_id"),
            col("n_tokens"), col("n_dups"))
      },
      Some {
        import graft.functions.{TextFns, UrlFns}
        val url = "'HTTPS://WWW.Example.com:443/page/' || " +
          "CAST(doc_id % 50 AS VARCHAR) || '?utm_source=s' || " +
          "CAST(doc_id AS VARCHAR) || '&ref=' || lang || '#top'"
        s"""WITH docs AS (
           |  SELECT doc_id, ${UrlFns.normalizeUrlSql(url)} AS canon,
           |    ${TextFns.tokenCountSql("text")} AS n_tokens
           |  FROM documents),
           |ranked AS (
           |  SELECT canon, doc_id, n_tokens,
           |    ROW_NUMBER() OVER (PARTITION BY canon
           |      ORDER BY n_tokens DESC, doc_id ASC) AS rn,
           |    COUNT(*) OVER (PARTITION BY canon) AS n_dups
           |  FROM docs)
           |SELECT canon, doc_id AS kept_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           |  CAST(n_dups AS BIGINT) AS n_dups
           |FROM ranked WHERE rn = 1""".stripMargin
      }),

    // Label-propagation COMMUNITIES over the same near-dup graph
    // (GraphRank.labelProp, deterministic synchronous variant): where d08
    // finds connected components, communities split a component whose
    // dense cores are joined by a single bridge doc — template families
    // sharing one hybrid document stay separate families. 3 rounds,
    // Pregel-shaped (linear per round), argmax via packed struct max.
    // (Rides the LSH pair relation like d16/d24.)
    Q("d22_label_communities",
      (s, dir) => graft.operators.GraphRank.labelProp(
        Dedup.minhashLshPairs(Tables(s, dir).documents,
          "doc_id", "text", N, NumHashes, RowsPerBand, LshThreshold),
        "id_a", "id_b", iters = 3),
      Some(graft.operators.GraphRank.labelPropSql(
        Dedup.minhashLshPairsSql("documents", "doc_id", "text",
          N, NumHashes, RowsPerBand, LshThreshold), iters = 3))),

    // Content-defined chunking (Chunker.cdcDupStats): Rabin-style
    // boundaries (rolling hash of the last 4 tokens ≡ 0 mod 8) make chunk
    // spans a function of content, not position — the dedup survives
    // insertions that shift offsets, which is exactly what d09's
    // fixed-width chunks cannot do. Same two chunk-keyed shuffles as d09
    // (freq agg + join, exchange reused); boundary detection is narrow.
    Q("d21_cdc_chunk_dedup",
      (s, dir) => graft.operators.Chunker.cdcDupStats(
        Tables(s, dir).documents, "doc_id", "text", window = 4, divisor = 8),
      Some(graft.operators.Chunker.cdcDupStatsSql(
        "documents", "doc_id", "text", window = 4, divisor = 8))),

    // Pigeonhole-banded Hamming search over the integer simhash: with
    // radius < bands, every pair within the radius shares at least one
    // exact signature band, so the engine's linear bucketed equi-join is
    // PROVABLY equal to the oracle's brute-force all-pairs bit_count(xor)
    // scan — LSH's shape with an exactness guarantee instead of a recall
    // probability. 32-bit/4-band/r=3 declared; 64/16 is the 100 TB shape.
    Q("d23_simhash_hamming_pairs",
      (s, dir) => Dedup.simhashHammingPairs(Tables(s, dir).documents,
        "doc_id", "text", bits = 32, bands = 4, radius = 3),
      Some(Dedup.simhashHammingPairsSql("documents", "doc_id", "text",
        bits = 32, bands = 4, radius = 3))),

    // Contamination BLAST RADIUS: bounded-depth BFS over the near-dup pair
    // graph from the directly-contaminated docs (t13's flags). Depth 0 =
    // benchmark overlap itself, depth 1 = near-dup of a contaminated doc,
    // depth 2 = two hops — the transitive remove-within-k policy that
    // catches paraphrased copies of leaked benchmark text which the direct
    // n-gram probe misses. The pair relation is the LSH one (d08's graph,
    // linear bucketed build), NOT the guarded exact-quadratic d03 form —
    // both the engine and the DuckDB replay stay tractable at scale.
    // Per-round cost is frontier x degree over the once-materialized edge
    // relation, never the whole component.
    // IMAGE perceptual near-dup pairs: mm14's 64-bit dHash (real decoded
    // pixels, codegen Expression) fed through the pigeonhole Hamming-band
    // join — d23's exactness guarantee (radius 3 < 4 bands ⇒ the banded
    // equi-join finds every pair the oracle's brute-force all-pairs scan
    // finds) now over IMAGES: re-encodes, cross-resolution copies,
    // brightness shifts and logo overlays collapse with no embedding
    // model. Undecodable payloads quarantine to null hashes and never
    // enter the pair relation. 100 TB shape: linear banded join, 16-bit
    // chunks ⇒ ~corpus/65536 per bucket; the quadratic scan exists only
    // oracle-side over the 9-row fixture set.
    Q("d25_image_dhash_pairs",
      (s, _) => {
        val imgs = s.read.parquet(MultimodalQueries.dhashFixturePath)
        val sig = imgs
          .select(col("name"), graft.plans.DHashBmp(col("payload")).as("dh"))
          .select(col("name"), col("dh.hi").as("hi"), col("dh.lo").as("lo"))
        Dedup.hammingPairs64(sig, "name", "hi", "lo", bands = 4, radius = 3)
      },
      Some(s"""WITH imgs AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('${MultimodalQueries.dhashFixturePath}')),
             |src AS (SELECT name AS key, h, n FROM imgs),
             |${graft.queries.MediaSql.bmpDHashCtes("src")}
             |${Dedup.hammingPairs64Sql(
                 "SELECT key AS id, hi, lo FROM bmpdhash", bands = 4, radius = 3)}""".stripMargin)),

    // AUDIO fingerprint near-dup pairs: mm16's energy-delta fingerprint
    // through the same banded Hamming machinery as d25 — re-encoded
    // recordings (rate conversions, stereo remasters, gain changes,
    // dropouts) collapse without an embedding model. Same pigeonhole
    // exactness and linear 100 TB shape; the all-pairs scan exists only
    // oracle-side over the 9-row fixture set.
    Q("d26_audio_fp_pairs",
      (s, _) => {
        val wavs = s.read.parquet(MultimodalQueries.audioFpFixturePath)
        val sig = wavs
          .select(col("name"),
            graft.plans.AudioFp(col("payload"), dstRate = 6000).as("fp"))
          .select(col("name"), col("fp.hi").as("hi"), col("fp.lo").as("lo"))
        Dedup.hammingPairs64(sig, "name", "hi", "lo", bands = 4, radius = 3)
      },
      Some(s"""WITH RECURSIVE wavs AS (
             |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
             |  FROM read_parquet('${MultimodalQueries.audioFpFixturePath}')),
             |src AS (SELECT name AS key, h, n FROM wavs),
             |${graft.queries.MediaSql.wavFpCtes("src", 6000)}
             |${Dedup.hammingPairs64Sql(
                 "SELECT key AS id, hi, lo FROM wavfp", bands = 4, radius = 3)}""".stripMargin)),

    // INCREMENTAL image near-dup (the d12 daily-ingest shape for d25):
    // the incoming batch's dHash bands join the precomputed corpus band
    // index — no self-join, per-batch cost linear in the batch, corpus
    // signatures computed once per ingest cycle. Batch = the planted
    // re-encodes; corpus = the originals + negatives. Every batch item
    // must rediscover its corpus original (or prove itself novel by
    // absence). Same pigeonhole exactness as d25.
    Q("d27_image_dhash_incremental",
      (s, _) => {
        val re = "_(reenc|up2x|bright|logo)$"
        val sig = s.read.parquet(MultimodalQueries.dhashFixturePath)
          .select(col("name"), graft.plans.DHashBmp(col("payload")).as("dh"))
          .select(col("name"), col("dh.hi").as("hi"), col("dh.lo").as("lo"))
        Dedup.hammingPairs64Batch(
          sig.filter(!col("name").rlike(re)), sig.filter(col("name").rlike(re)),
          "name", "hi", "lo", bands = 4, radius = 3)
      },
      Some {
        val re = "_(reenc|up2x|bright|logo)$"
        s"""WITH imgs AS (
           |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
           |  FROM read_parquet('${MultimodalQueries.dhashFixturePath}')),
           |src AS (SELECT name AS key, h, n FROM imgs),
           |${graft.queries.MediaSql.bmpDHashCtes("src")}
           |${Dedup.hammingPairs64BatchSql(
               s"SELECT key AS id, hi, lo FROM bmpdhash WHERE regexp_matches(key, '$re')",
               s"SELECT key AS id, hi, lo FROM bmpdhash WHERE NOT regexp_matches(key, '$re')",
               bands = 4, radius = 3)}""".stripMargin
      }),

    // AUDIO incremental admit (d27's twin over mm16 fingerprints — the
    // daily audio-ingest shape): the incoming batch's fingerprint bands
    // join the precomputed corpus band index, no self-join on either
    // side. Batch = the planted re-encodes (rate conversion, stereo
    // remaster, gain change, dropout); corpus = the originals + distinct
    // tones. Every re-encode must rediscover its corpus original through
    // the band join (algebraic invariances: Hamming 0 for stereo/gain,
    // tiny for 22k, exactly 2 for the dropout — all < 3 < 4 bands, so
    // pigeonhole exactness applies); novel recordings prove themselves by
    // absence; undecodables (8-bit PCM, non-WAV) quarantine to null and
    // never reach the join. Oracle: brute-force cross scan.
    Q("d28_audio_fp_incremental",
      (s, _) => {
        val re = "_(22k|stereo|gain|drop)$"
        val sig = s.read.parquet(MultimodalQueries.audioFpFixturePath)
          .select(col("name"),
            graft.plans.AudioFp(col("payload"), dstRate = 6000).as("fp"))
          .select(col("name"), col("fp.hi").as("hi"), col("fp.lo").as("lo"))
        Dedup.hammingPairs64Batch(
          sig.filter(!col("name").rlike(re)), sig.filter(col("name").rlike(re)),
          "name", "hi", "lo", bands = 4, radius = 3)
      },
      Some {
        val re = "_(22k|stereo|gain|drop)$"
        s"""WITH RECURSIVE wavs AS (
           |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
           |  FROM read_parquet('${MultimodalQueries.audioFpFixturePath}')),
           |src AS (SELECT name AS key, h, n FROM wavs),
           |${graft.queries.MediaSql.wavFpCtes("src", 6000)}
           |${Dedup.hammingPairs64BatchSql(
               s"SELECT key AS id, hi, lo FROM wavfp WHERE regexp_matches(key, '$re')",
               s"SELECT key AS id, hi, lo FROM wavfp WHERE NOT regexp_matches(key, '$re')",
               bands = 4, radius = 3)}""".stripMargin
      }),

    // The PERSISTED band index (d29): d27's admit join against a
    // pre-built BUCKETED corpus band index instead of re-exploding the
    // corpus per batch. hammingPairs64Batch shuffles O(corpus) bands on
    // EVERY call — the band index is exploded once, landed bucketed by
    // the packed (band, value) key, and per-batch probes shuffle only
    // the batch's bands (the index scan is bucket-aligned, zero
    // exchanges corpus-side — spec-asserted on the physical plan). This
    // is the shape a 10^9-asset corpus actually serves daily ingest
    // from; identical pigeonhole exactness, same brute-force oracle as
    // d27.
    Q("d29_image_dhash_index_probe",
      (s, _) => {
        val re = "_(reenc|up2x|bright|logo)$"
        val sig = s.read.parquet(MultimodalQueries.dhashFixturePath)
          .select(col("name"), graft.plans.DHashBmp(col("payload")).as("dh"))
          .select(col("name"), col("dh.hi").as("hi"), col("dh.lo").as("lo"))
        val idxTab = s"g_dhash_bandidx_${LayoutQueries.tag("fixtures")}"
        LayoutQueries.ensureTable(s, idxTab)(graft.util.Layout.writeBucketed(
          Dedup.bandIndex64(sig.filter(!col("name").rlike(re)),
            "name", "hi", "lo", bands = 4).repartition(8, col("bk")),
          idxTab, "bk", 8, Some("bk")))
        Dedup.hammingPairs64Probe(s.table(idxTab),
          sig.filter(col("name").rlike(re)), "name", "hi", "lo",
          bands = 4, radius = 3)
      },
      Some {
        val re = "_(reenc|up2x|bright|logo)$"
        s"""WITH imgs AS (
           |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
           |  FROM read_parquet('${MultimodalQueries.dhashFixturePath}')),
           |src AS (SELECT name AS key, h, n FROM imgs),
           |${graft.queries.MediaSql.bmpDHashCtes("src")}
           |${Dedup.hammingPairs64BatchSql(
               s"SELECT key AS id, hi, lo FROM bmpdhash WHERE regexp_matches(key, '$re')",
               s"SELECT key AS id, hi, lo FROM bmpdhash WHERE NOT regexp_matches(key, '$re')",
               bands = 4, radius = 3)}""".stripMargin
      }),

    // Index MAINTENANCE (d31): fold-in compaction ≡ full rebuild ≡ brute
    // force. The d29 index is not static — admitted signatures keep
    // arriving — and the maintenance contract is that a compaction cycle
    // APPENDS the tail's band rows to the existing index without
    // re-exploding (or even re-reading the payloads of) the already-
    // indexed corpus. Here the corpus is split into an initially-indexed
    // half and a later-admitted tail; the compacted index = initial
    // table's rows ∪ bandIndex64(tail), rewritten bucketed. The batch's
    // logo re-encode can only be found through a TAIL signature
    // (scene_b lives in the appended half), so the hash proves the
    // fold-in genuinely extends coverage — against the same brute-force
    // full-corpus oracle d29 probes its full-rebuild index against,
    // which makes fold-in ≡ rebuild transitive and both hash-gated.
    Q("d31_image_index_compaction",
      (s, _) => {
        val re = "_(reenc|up2x|bright|logo)$"
        val sig = s.read.parquet(MultimodalQueries.dhashFixturePath)
          .select(col("name"), graft.plans.DHashBmp(col("payload")).as("dh"))
          .select(col("name"), col("dh.hi").as("hi"), col("dh.lo").as("lo"))
        val corpus = sig.filter(!col("name").rlike(re))
        val initTab = s"g_dhash_bandidx_init_${LayoutQueries.tag("fixtures")}"
        val compTab = s"g_dhash_bandidx_comp_${LayoutQueries.tag("fixtures")}"
        LayoutQueries.ensureTable(s, initTab)(graft.util.Layout.writeBucketed(
          Dedup.bandIndex64(corpus.filter(col("name") < "scene_b"),
            "name", "hi", "lo", bands = 4).repartition(8, col("bk")),
          initTab, "bk", 8, Some("bk")))
        LayoutQueries.ensureTable(s, compTab)(graft.util.Layout.writeBucketed(
          s.table(initTab)
            .unionByName(Dedup.bandIndex64(
              corpus.filter(col("name") >= "scene_b"),
              "name", "hi", "lo", bands = 4))
            .repartition(8, col("bk")),
          compTab, "bk", 8, Some("bk")))
        Dedup.hammingPairs64Probe(s.table(compTab),
          sig.filter(col("name").rlike(re)), "name", "hi", "lo",
          bands = 4, radius = 3)
      },
      Some {
        val re = "_(reenc|up2x|bright|logo)$"
        s"""WITH imgs AS (
           |  SELECT name, hex(payload) AS h, octet_length(payload) AS n
           |  FROM read_parquet('${MultimodalQueries.dhashFixturePath}')),
           |src AS (SELECT name AS key, h, n FROM imgs),
           |${graft.queries.MediaSql.bmpDHashCtes("src")}
           |${Dedup.hammingPairs64BatchSql(
               s"SELECT key AS id, hi, lo FROM bmpdhash WHERE regexp_matches(key, '$re')",
               s"SELECT key AS id, hi, lo FROM bmpdhash WHERE NOT regexp_matches(key, '$re')",
               bands = 4, radius = 3)}""".stripMargin
      }),

    Q("d24_contamination_radius",
      (s, dir) => {
        val t = Tables(s, dir)
        val pairs = Dedup.minhashLshPairs(t.documents, "doc_id", "text",
          N, NumHashes, RowsPerBand, LshThreshold)
        val seeds = graft.operators.Decontaminate.overlapFlags(
          t.documents.filter(col("doc_id") >= 50),
          t.documents.filter(col("doc_id") < 50),
          "doc_id", "text", n = 3, frac = 0.5)
          .filter(col("contaminated"))
        graft.operators.GraphRank.bfsDepths(pairs, "id_a", "id_b",
          seeds, "id", maxDepth = 2)
      },
      Some(graft.operators.GraphRank.bfsDepthsSql(
        Dedup.minhashLshPairsSql("documents", "doc_id", "text",
          N, NumHashes, RowsPerBand, LshThreshold),
        "SELECT id FROM (" + graft.operators.Decontaminate.overlapFlagsSql(
          "documents", "doc_id", "text", n = 3, frac = 0.5, "doc_id < 50") +
          ") WHERE contaminated",
        maxDepth = 2))),
  )
}
