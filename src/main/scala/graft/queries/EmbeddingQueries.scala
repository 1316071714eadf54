package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Coreset, KMeans, Similarity}
import graft.util.Tables

/** Similarity-search queries over `embeddings` (64-dim float vectors):
  * brute-force cosine top-k, sign-LSH-bucketed approximate top-k, and
  * embedding near-dup pairs. Cosine scores are oracle-compared exactly
  * (no tolerance) because both engines evaluate the identical
  * left-associated double expression tree (see VectorFns).
  */
object EmbeddingQueries {

  private val Dim = 64
  private val K = 5
  private val NumPlanes = 4
  private val NearDupThreshold = 0.4

  /** Probe set: the first 10 vectors. */
  private val QueryPredSql = "vec_id < 10"

  /** e18's per-JVM index-build guard (the LayoutQueries discipline:
    * `computeIfAbsent` blocks concurrent callers until the write lands;
    * keying by the derived root makes sf dirs independent).
    */
  private val annIndexBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def annIndexRoot(dir: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    new java.io.File(sys.props("java.io.tmpdir"), s"graft_annindex_$tag")
      .getAbsolutePath
  }

  val all: Seq[Q] = Seq(
    Q("e01_knn_bruteforce",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.cosineTopK(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K)
      },
      Some(Similarity.cosineTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, QueryPredSql))),

    // Same contract as e01 through the partial-top-k Aggregator (scale
    // path) — shares e01's oracle, so the aggregator is hash-checked too.
    Q("e04_knn_topk_aggregator",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.cosineTopKAgg(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K)
      },
      Some(Similarity.cosineTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, QueryPredSql))),

    Q("e02_knn_lsh",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.lshTopK(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K,
          numPlanes = NumPlanes, probeRadius = 2)
      },
      Some(Similarity.lshTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, NumPlanes, QueryPredSql, probeRadius = 2))),

    Q("e05_knn_ivf",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.ivfTopK(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K,
          nlist = 16, nprobe = 4)
      },
      Some(Similarity.ivfTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, 16, 4, QueryPredSql))),

    // IVF with LEARNED centroids: k-means (engine-exact, the e07 chain)
    // trains the coarse quantizer instead of seeding with the first nlist
    // ids — better recall at the same nlist/nprobe (spec-checked vs brute
    // force in SimilaritySpec).
    Q("e09_knn_ivf_kmeans",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.ivfKMeansTopK(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K,
          nlist = 16, iters = 2, nprobe = 4)
      },
      Some(Similarity.ivfKMeansTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, 16, 2, 4, QueryPredSql))),

    // Int8-quantized candidates + exact rerank: the corpus is scanned only
    // through a 4x-smaller binary quantized column (codegen integer dot,
    // plans.QuantizeI8/DotProductI8); float vectors are touched for the
    // top-20 candidates per query only. Engine-exact: the oracle replays
    // the identical quantized integers.
    Q("e10_knn_quantized",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.quantizedTopK(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K, rerank = 20)
      },
      Some(Similarity.quantizedTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, 20, QueryPredSql))),

    // Johnson–Lindenstrauss DIMENSION reduction + exact rerank (vs e10's
    // precision reduction): one narrow ±1-sign projection to r=16 dims
    // (deterministic literals both engines embed), projected-cosine
    // candidates — 4x less scoring arithmetic and scan bytes — then exact
    // rerank of the top 20. The reduced vectors are what a 100 TB corpus
    // would persist for all downstream distance work.
    Q("e17_knn_jl",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.jlTopK(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, r = 16, k = K,
          rerank = 20)
      },
      Some(Similarity.jlTopKSql("embeddings", "vec_id", "embedding",
        Dim, 16, K, 20, QueryPredSql))),

    // PRODUCT quantization, DECLARED as the serving path (the PQ-family
    // primary, VERDICT r5 task 4): codebooks + codes are trained and
    // persisted ONCE per JVM (AnnIndex.buildIvfPq with nlist=1 — a single
    // coarse list IS pure PQ: every probe scans all codes, only the m
    // byte-codes bound the scan), and the declared query runs load +
    // ADC-score + exact rerank with NO Lloyd iteration. At 100 TB,
    // retraining per query is the scale-killer; the serve shape here is
    // what a production batch costs. The retrain twin (e11v) keeps the
    // inline-training oracle parity proof.
    Q("e11_knn_pq",
      (s, dir) => {
        val t = Tables(s, dir)
        val root = annIndexRoot(dir) + "_pq1"
        annIndexBuilt.computeIfAbsent(root, _ => {
          graft.operators.AnnIndex.buildIvfPq(
            t.embeddings, "vec_id", "embedding", Dim,
            nlist = 1, itersCoarse = 2, m = 8, ksub = 16, itersPq = 2, root)
          java.lang.Boolean.TRUE
        })
        graft.operators.AnnIndex.queryIvfPq(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K,
          nprobe = 1, rerank = 20, dir = root)
      },
      Some(Similarity.ivfPqTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, 1, 2, 1, 8, 16, 2, 20, QueryPredSql))),

    // e11's RETRAIN twin, verification-only: the whole PQ chain (m=8
    // subspace codebooks, ksub=16, engine-exact Lloyd) folded into one
    // query so the DuckDB oracle can replay the training — the bit-parity
    // proof behind the serve path's codebooks. Not the shape to run per
    // query at scale; that is exactly why e11 declares the serve cost.
    Q("e11v_knn_pq_retrain",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.pqTopK(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, m = 8, ksub = 16,
          iters = 2, k = K, rerank = 20)
      },
      Some(Similarity.pqTopKSql("embeddings", "vec_id", "embedding",
        Dim, 8, 16, 2, K, 20, QueryPredSql))),

    // IVF-PQ, DECLARED as the serving path (the scale-primary): e18's
    // persisted index (same root — built once per JVM, shared), probed at
    // nprobe=8 — the per-query recall knob turned on the SAME immutable
    // index, no retraining in the query. The two scale levers both come
    // from the index: coarse lists bound WHAT is scanned, product codes
    // bound the BYTES per scanned row; exact rerank on top. Retrain twin:
    // e12v.
    Q("e12_knn_ivf_pq",
      (s, dir) => {
        val t = Tables(s, dir)
        val root = annIndexRoot(dir)
        annIndexBuilt.computeIfAbsent(root, _ => {
          graft.operators.AnnIndex.buildIvfPq(
            t.embeddings, "vec_id", "embedding", Dim,
            nlist = 16, itersCoarse = 2, m = 8, ksub = 16, itersPq = 2, root)
          java.lang.Boolean.TRUE
        })
        graft.operators.AnnIndex.queryIvfPq(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K,
          nprobe = 8, rerank = 20, dir = root)
      },
      Some(Similarity.ivfPqTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, 16, 2, 8, 8, 16, 2, 20, QueryPredSql))),

    // e12's RETRAIN twin, verification-only: coarse quantizer + codebooks
    // trained inline (e09 + e11v composed) so the oracle replays the whole
    // IVF-PQ build — the parity anchor for the persisted index.
    Q("e12v_knn_ivf_pq_retrain",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.ivfPqTopK(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K,
          nlist = 16, itersCoarse = 2, nprobe = 4, m = 8, ksub = 16,
          itersPq = 2, rerank = 20)
      },
      Some(Similarity.ivfPqTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, 16, 2, 4, 8, 16, 2, 20, QueryPredSql))),

    // The PERSISTED-index serving path: e12's exact parameters, but the
    // coarse quantizer + codebooks + codes are trained and written ONCE
    // per JVM (AnnIndex.buildIvfPq, parquet under tmpdir) and the declared
    // query runs ONLY the load+probe+rerank serving path — byte-identical
    // to the inline operator (same tie-break folds over the cid-sorted
    // reload), so it rides e12's oracle. The guard always rebuilds in a
    // fresh JVM (never trusts a stale on-disk index for changed data).
    Q("e18_ann_index_query",
      (s, dir) => {
        val t = Tables(s, dir)
        val root = annIndexRoot(dir)
        annIndexBuilt.computeIfAbsent(root, _ => {
          graft.operators.AnnIndex.buildIvfPq(
            t.embeddings, "vec_id", "embedding", Dim,
            nlist = 16, itersCoarse = 2, m = 8, ksub = 16, itersPq = 2, root)
          java.lang.Boolean.TRUE
        })
        graft.operators.AnnIndex.queryIvfPq(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K,
          nprobe = 4, rerank = 20, dir = root)
      },
      Some(Similarity.ivfPqTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, 16, 2, 4, 8, 16, 2, 20, QueryPredSql))),

    // ANN index DRIFT MONITOR — the rebuild-trigger signal for the
    // incremental-append contract (AnnIndex.appendIvfPq rides STALE
    // codebooks by design): recall@k of the appended batch's own vectors,
    // served from the stale-encoded index, against the exact scan. A
    // production pipeline alerts/rebuilds when this dips below target;
    // the spec plants an out-of-distribution batch and shows exactly that
    // dip vanish on retrain. Engine: build on the base split (vec_id % 20
    // <> 7), append the held-out batch with the STORED constants, serve;
    // oracle: the stale-codebook replay (train CTEs on base, encode CTEs
    // over the full corpus) — hash-exact, not a tolerance check.
    // Cost: one-time build (guarded, untimed after first call) + a serve
    // probe + one |Q|·k recall join — corpus-size-free at query time.
    Q("e19_ann_drift_monitor",
      (s, dir) => {
        val t = Tables(s, dir)
        val root = annIndexRoot(dir) + "_e19"
        val appendPred = col("vec_id") % 20 === 7
        annIndexBuilt.computeIfAbsent(root, _ => {
          graft.operators.AnnIndex.buildIvfPq(
            t.embeddings.filter(!appendPred), "vec_id", "embedding", Dim,
            nlist = 16, itersCoarse = 2, m = 8, ksub = 16, itersPq = 2, root)
          graft.operators.AnnIndex.appendIvfPq(
            t.embeddings.filter(appendPred), "vec_id", "embedding", Dim, root)
          java.lang.Boolean.TRUE
        })
        val queries = t.embeddings.filter(appendPred && col("vec_id") < 200)
        Similarity.recallAtK(
          approx = graft.operators.AnnIndex.queryIvfPq(
            corpus = t.embeddings, queries = queries,
            idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K,
            nprobe = 4, rerank = 20, dir = root),
          exact = Similarity.cosineTopK(t.embeddings, queries,
            "vec_id", "embedding", Dim, K))
      },
      Some(Similarity.recallAtKSql(
        Similarity.ivfPqTopKStaleSql("embeddings", "vec_id", "embedding",
          Dim, K, 16, 2, 4, 8, 16, 2, 20,
          trainPred = "vec_id % 20 <> 7",
          queryPred = "vec_id % 20 = 7 AND vec_id < 200"),
        Similarity.cosineTopKSql("embeddings", "vec_id", "embedding",
          Dim, K, "vec_id % 20 = 7 AND vec_id < 200")))),

    // The REBUILD LOOP composed (e21): e19 gives the drift signal,
    // AnnIndex gives train/append/serve — this row strings them into the
    // maintenance cycle a production vector store actually runs:
    // (1) the STALE state — base-trained codebooks serving an appended
    // batch they never saw (e19's artifact, reused) — and (2) the
    // REBUILT state — codebooks retrained over the full corpus — each
    // measured as recall@k of the appended batch against the exact scan,
    // landed as one relation keyed by phase. The 'rebuilt' rows are the
    // recovery the e19 alert promises; AnnIndexSpec asserts the dip is
    // real (planted OOD batch) and strictly recovers. Oracle: both
    // phases replayed relationally — the stale-codebook chain and the
    // full-retrain chain — hash-exact, not a tolerance check.
    // Cost: two guarded one-time builds; at query time two serve probes
    // + two |Q|·k recall joins — corpus-size-free.
    Q("e21_ann_rebuild_loop",
      (s, dir) => {
        val t = Tables(s, dir)
        val appendPred = col("vec_id") % 20 === 7
        val staleRoot = annIndexRoot(dir) + "_e19"
        annIndexBuilt.computeIfAbsent(staleRoot, _ => {
          graft.operators.AnnIndex.buildIvfPq(
            t.embeddings.filter(!appendPred), "vec_id", "embedding", Dim,
            nlist = 16, itersCoarse = 2, m = 8, ksub = 16, itersPq = 2,
            staleRoot)
          graft.operators.AnnIndex.appendIvfPq(
            t.embeddings.filter(appendPred), "vec_id", "embedding", Dim,
            staleRoot)
          java.lang.Boolean.TRUE
        })
        val rebuiltRoot = annIndexRoot(dir) + "_e21"
        annIndexBuilt.computeIfAbsent(rebuiltRoot, _ => {
          graft.operators.AnnIndex.buildIvfPq(
            t.embeddings, "vec_id", "embedding", Dim,
            nlist = 16, itersCoarse = 2, m = 8, ksub = 16, itersPq = 2,
            rebuiltRoot)
          java.lang.Boolean.TRUE
        })
        val queries = t.embeddings.filter(appendPred && col("vec_id") < 200)
        val exact = Similarity.cosineTopK(t.embeddings, queries,
          "vec_id", "embedding", Dim, K)
        def phaseRecall(root: String, phase: String) =
          Similarity.recallAtK(
            approx = graft.operators.AnnIndex.queryIvfPq(
              corpus = t.embeddings, queries = queries,
              idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K,
              nprobe = 4, rerank = 20, dir = root),
            exact = exact)
            .select(lit(phase).as("phase"), col("query_id"), col("hits"),
              col("n_exact"), col("recall"))
        phaseRecall(staleRoot, "stale")
          .unionByName(phaseRecall(rebuiltRoot, "rebuilt"))
      },
      Some {
        val qp = "vec_id % 20 = 7 AND vec_id < 200"
        val exactSql = Similarity.cosineTopKSql("embeddings", "vec_id",
          "embedding", Dim, K, qp)
        s"""SELECT 'stale' AS phase, * FROM (
           |${Similarity.recallAtKSql(
               Similarity.ivfPqTopKStaleSql("embeddings", "vec_id", "embedding",
                 Dim, K, 16, 2, 4, 8, 16, 2, 20,
                 trainPred = "vec_id % 20 <> 7", queryPred = qp),
               exactSql)})
           |UNION ALL
           |SELECT 'rebuilt' AS phase, * FROM (
           |${Similarity.recallAtKSql(
               Similarity.ivfPqTopKSql("embeddings", "vec_id", "embedding",
                 Dim, K, 16, 2, 4, 8, 16, 2, 20, qp),
               exactSql)})""".stripMargin
      }),

    // CODES COMPACTION (e22, the d31 fold-in analog for the ANN index):
    // appendIvfPq accretes one ingest_batch partition per batch forever;
    // AnnIndex.compactCodes folds the committed partitions back into the
    // bootstrap partition of a NEW versioned directory WITHOUT retraining
    // — codebooks/centroids copied, codes never re-encoded, file count
    // reset to one-per-list. This row proves the fold is invisible:
    // serve-from-compacted ≡ the stale-codebook replay (the same oracle
    // e19 rides — if compaction moved, dropped, or duplicated a single
    // code row, the probe ranking would shift), and the whole-index
    // per-list manifest ≡ the relational stale-encode of the full corpus
    // (counts + id and code0 checksums pin WHAT is in the index).
    // Engine: base-built index (ingest layout) + two appended batches +
    // compactCodes(through=1); AnnIndexSpec adds the partial-fold replay
    // race, EmbIngestStreamSpec the kill-between-compaction-and-swap race.
    Q("e22_codes_compaction",
      (s, dir) => {
        val t = Tables(s, dir)
        val appendPred = col("vec_id") % 20 === 7
        val root = annIndexRoot(dir) + "_e22"
        val compacted = root + "_v2"
        annIndexBuilt.computeIfAbsent(compacted, _ => {
          graft.operators.AnnIndex.buildIvfPq(
            t.embeddings.filter(!appendPred), "vec_id", "embedding", Dim,
            nlist = 16, itersCoarse = 2, m = 8, ksub = 16, itersPq = 2,
            root, ingestBatch = Some(-1L))
          graft.operators.AnnIndex.appendIvfPq(
            t.embeddings.filter(appendPred && col("vec_id") % 40 === 7),
            "vec_id", "embedding", Dim, root, ingestBatch = Some(0L))
          graft.operators.AnnIndex.appendIvfPq(
            t.embeddings.filter(appendPred && col("vec_id") % 40 === 27),
            "vec_id", "embedding", Dim, root, ingestBatch = Some(1L))
          graft.operators.AnnIndex.compactCodes(s, root, compacted,
            through = 1L)
          java.lang.Boolean.TRUE
        })
        val queries = t.embeddings.filter(appendPred && col("vec_id") < 200)
        graft.operators.AnnIndex.queryIvfPq(
            corpus = t.embeddings, queries = queries, idCol = "vec_id",
            vecCol = "embedding", dim = Dim, k = K, nprobe = 4, rerank = 20,
            dir = compacted)
          .select(lit("query").as("kind"), col("query_id").as("k1"),
            col("neighbor_id").as("k2"), col("rank").as("n1"),
            lit(null).cast("bigint").as("n2"), col("cos_sim").as("x"))
          .unionByName(graft.operators.AnnIndex.readCodes(s, compacted)
            .groupBy(col("list_id"))
            .agg(count(lit(1)).as("n_codes"),
              sum(col("neighbor_id")).as("id_checksum"),
              sum(col("code0")).as("code0_checksum"))
            .select(lit("list").as("kind"), col("list_id").as("k1"),
              col("id_checksum").as("k2"), col("n_codes").as("n1"),
              col("code0_checksum").cast("bigint").as("n2"),
              lit(null).cast("double").as("x")))
      },
      Some {
        val qp = "vec_id % 20 = 7 AND vec_id < 200"
        s"""SELECT 'query' AS kind, query_id AS k1, neighbor_id AS k2,
           |  rank AS n1, CAST(NULL AS BIGINT) AS n2, cos_sim AS x
           |FROM (
           |${Similarity.ivfPqTopKStaleSql("embeddings", "vec_id", "embedding",
               Dim, K, 16, 2, 4, 8, 16, 2, 20,
               trainPred = "vec_id % 20 <> 7", queryPred = qp)}) _q
           |UNION ALL
           |SELECT 'list', list_id, id_checksum, n_codes, code0_checksum,
           |  CAST(NULL AS DOUBLE)
           |FROM (
           |${Similarity.pqListManifestSql("embeddings", "vec_id", "embedding",
               Dim, 16, 2, 8, 16, 2,
               trainPred = "vec_id % 20 <> 7",
               rowsRel = "SELECT vec_id, embedding FROM embeddings")}) _m""".stripMargin
      }),

    // FILTERED vector search over the shared persisted index (e18's
    // artifact, untouched): a metadata predicate restricts the codes scan
    // BEFORE probing — pre-filter semantics, so the top-k is exact over
    // the qualifying subset instead of the silent recall loss of
    // post-filtering an unfiltered top-k. The oracle replays the full
    // train+encode chain with the same predicate on the scored scan.
    Q("e20_filtered_ann",
      (s, dir) => {
        val t = Tables(s, dir)
        val root = annIndexRoot(dir)
        annIndexBuilt.computeIfAbsent(root, _ => {
          graft.operators.AnnIndex.buildIvfPq(
            t.embeddings, "vec_id", "embedding", Dim,
            nlist = 16, itersCoarse = 2, m = 8, ksub = 16, itersPq = 2, root)
          java.lang.Boolean.TRUE
        })
        graft.operators.AnnIndex.queryIvfPq(
          corpus = t.embeddings, queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim, k = K,
          nprobe = 8, rerank = 20, dir = root,
          scanPred = Some(col("neighbor_id") % 3 === 0))
      },
      Some(Similarity.ivfPqTopKSql("embeddings", "vec_id", "embedding",
        Dim, K, 16, 2, 8, 8, 16, 2, 20, QueryPredSql,
        scanPred = Some("c.neighbor_id % 3 = 0")))),

    Q("e03_embedding_near_dups",
      (s, dir) => Similarity.cosineNearDupPairs(
        Tables(s, dir).embeddings, "vec_id", "embedding", Dim, NearDupThreshold),
      Some(Similarity.cosineNearDupPairsSql("embeddings", "vec_id", "embedding",
        Dim, NearDupThreshold))),
    Q("e06_near_dups_lsh",
      (s, dir) => Similarity.lshNearDupPairs(
        Tables(s, dir).embeddings, "vec_id", "embedding", Dim,
        NearDupThreshold, NumPlanes),
      Some(Similarity.lshNearDupPairsSql("embeddings", "vec_id", "embedding",
        Dim, NearDupThreshold, NumPlanes))),

    // Distributed Lloyd's k-means (2 iterations, contiguous-id-block seed):
    // assignment is bit-identical across engines via integer-quantized
    // vectors + exact fold-ordered distances — the oracle replays the full
    // iteration.
    Q("e07_kmeans_assign",
      (s, dir) => KMeans.assign(Tables(s, dir).embeddings,
        "vec_id", "embedding", Dim, k = 32, iters = 2),
      Some(KMeans.assignSql("embeddings", "vec_id", "embedding",
        Dim, k = 32, iters = 2))),

    // SemDeDup: k-means clusters bound the candidate pairs, then cosine
    // near-dups within each cluster are dropped keep-lowest-id. The
    // cluster count is DERIVED from the corpus (max(32, n/500), mirrored
    // in the oracle's params CTE) so the within-cluster pair work stays
    // ~n·500 as the corpus grows — the n²/k contract demonstrated in the
    // declared query, not just documented.
    Q("e08_semantic_dedup",
      (s, dir) => KMeans.semanticDedupAutoK(Tables(s, dir).embeddings,
        "vec_id", "embedding", Dim, iters = 2,
        threshold = NearDupThreshold),
      Some(KMeans.semanticDedupAutoKSql("embeddings", "vec_id", "embedding",
        Dim, iters = 2, threshold = NearDupThreshold))),

    // Diversity-aware retrieval (MMR rerank): from each query's 20
    // cosine-nearest candidates, greedily pick 5 trading relevance against
    // redundancy with what's already picked (λ=0.7) — the RAG context-
    // selection step that stops five near-identical top hits crowding out
    // the fifth distinct aspect. Greedy selection runs per-query inside
    // flatMapGroups on the bounded candidate set; the oracle replays the
    // identical argmax chain as 5 unrolled CTE steps.
    Q("e13_mmr_rerank",
      (s, dir) => {
        val t = Tables(s, dir)
        Similarity.mmrTopK(
          corpus = t.embeddings,
          queries = t.embeddings.filter(col("vec_id") < 10),
          idCol = "vec_id", vecCol = "embedding", dim = Dim,
          cands = 20, k = K, lambda = 0.7)
      },
      Some(Similarity.mmrTopKSql("embeddings", "vec_id", "embedding",
        Dim, cands = 20, k = K, lambda = 0.7, QueryPredSql))),

    // The ANN evaluation harness as a first-class query: recall@5 of the
    // sign-LSH path (e02) against the exact scan (e01), per query. This is
    // how nlist/nprobe/planes get TUNED — the engine ships its own scorer.
    // Cost: two |Q|·k relations joined and reduced; corpus-size-free.
    Q("e14_ann_recall",
      (s, dir) => {
        val t = Tables(s, dir)
        val queries = t.embeddings.filter(col("vec_id") < 10)
        Similarity.recallAtK(
          approx = Similarity.lshTopK(t.embeddings, queries,
            "vec_id", "embedding", Dim, K, NumPlanes, probeRadius = 2),
          exact = Similarity.cosineTopK(t.embeddings, queries,
            "vec_id", "embedding", Dim, K))
      },
      Some(Similarity.recallAtKSql(
        Similarity.lshTopKSql("embeddings", "vec_id", "embedding",
          Dim, K, NumPlanes, QueryPredSql, probeRadius = 2),
        Similarity.cosineTopKSql("embeddings", "vec_id", "embedding",
          Dim, K, QueryPredSql)))),

    // Diversity coreset: greedy k-center (farthest-point) selection — the
    // data-curation complement of e08's SemDeDup (pick the spread-out
    // subset rather than drop the redundant). Per round: one narrow
    // constant-centers codegen projection + a 1-row TakeOrdered argmin;
    // the corpus is never joined or shuffled. Oracle replays the greedy
    // chain as 8 unrolled CTE steps (the e13 shape).
    Q("e15_kcenter_sample",
      (s, dir) => Coreset.kCenterSample(Tables(s, dir).embeddings,
        "vec_id", "embedding", Dim, k = 8),
      Some(Coreset.kCenterSampleSql("embeddings", "vec_id", "embedding",
        Dim, k = 8))),

    // Cluster-quality eval (simplified silhouette on a bounded sample) —
    // the k-means tuning harness next to e14 (ANN recall) and d20 (LSH
    // recall): per-sample a/b/sil against the engine-exact k=8 assignment.
    // Corpus streams once; the sample side is broadcast.
    Q("e16_cluster_quality",
      (s, dir) => KMeans.clusterQuality(Tables(s, dir).embeddings,
        "vec_id", "embedding", Dim, k = 8, iters = 2,
        samplePred = col("vec_id") < 20),
      Some(KMeans.clusterQualitySql("embeddings", "vec_id", "embedding",
        Dim, k = 8, iters = 2, samplePredSql = "vec_id < 20"))),
  )
}
