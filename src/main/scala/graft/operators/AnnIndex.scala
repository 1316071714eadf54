package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** ANN index PERSISTENCE — the train-once / serve-many lifecycle that the
  * inline IVF-PQ operator (e12) deliberately folds into a single query for
  * oracle parity. `buildIvfPq` trains the coarse quantizer and the m
  * subspace codebooks ONCE, then writes the whole index as three parquet
  * tables; `queryIvfPq` loads it and answers top-k with NO retraining —
  * the production serving shape (a new query batch costs a probe + a
  * code-scan + an exact rerank on ≤ rerank candidates, never a Lloyd
  * iteration).
  *
  * Layout under `dir`:
  *   centroids/  (cid, cent)            — nlist rows
  *   codebooks/  (subspace, cid, codeword) — m·ksub rows
  *   codes/      (neighbor_id, list_id, cnorm, code0..code{m-1})
  *
  * The codes table is the only corpus-sized relation and holds m small
  * codes per row instead of dim floats — the scan-bytes win PQ exists for.
  * Original vectors are NOT duplicated into the index: the exact rerank
  * fetches the ≤ |queries|·rerank candidate vectors from the corpus by an
  * id join with the small side broadcast (the corpus never shuffles).
  *
  * Bit-parity with the inline operator: centroids/codebooks round-trip
  * through parquet as exact doubles and are re-collected SORTED BY cid —
  * the same order `KMeans.assignWithCentroids`/`trainSubspaceBooks` emit —
  * so every tie-break fold (coarse argmax, probe ranking, candidate
  * window) replays identically and `queryIvfPq` returns byte-identical
  * results to [[Similarity.ivfPqTopK]] at equal parameters (spec-checked,
  * and e18 rides e12's DuckDB oracle on exactly this claim).
  *
  * Scale (100 TB): build is the e07/e11 training shape (k-row driver
  * round-trips, one shuffle per Lloyd iteration) plus ONE narrow encode
  * pass over the corpus; query is a broadcast probe join against the
  * bucketed code scan — per-query cost tracks nprobe/nlist of the codes
  * table, and the index directory is immutable (serve from many sessions,
  * rebuild only when the corpus drifts).
  */
object AnnIndex {

  /** `ingestBatch`, when set, lands the codes PARTITIONED by an
    * `ingest_batch` column (this build stamped with the given id, e.g.
    * -1 for a bootstrap) with dynamic partition overwrite — the layout
    * the incremental ingest pipeline (m15) needs so that per-batch
    * [[appendIvfPq]] calls are EXACTLY-ONCE under streaming replay (a
    * replayed batch overwrites its own partition instead of appending a
    * duplicate file). All codes under one root must use the same mode:
    * never mix partitioned and flat layouts in one index directory.
    */
  def buildIvfPq(corpus: DataFrame, idCol: String, vecCol: String, dim: Int,
      nlist: Int, itersCoarse: Int, m: Int, ksub: Int, itersPq: Int,
      dir: String, ingestBatch: Option[Long] = None): Unit = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val spark = corpus.sparkSession
    import spark.implicits._
    val dsub = dim / m
    val (_, kc) = KMeans.assignWithCentroids(
      corpus, idCol, vecCol, dim, nlist, itersCoarse)
    val books = KMeans.trainSubspaceBooks(
      corpus, idCol, vecCol, dim, m, ksub, itersPq)
    kc.map { case (cid, c) => (cid, c.toSeq) }
      .toDF("cid", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
    books.zipWithIndex
      .flatMap { case (bk, j) => bk.map { case (cid, cw) => (j, cid, cw.toSeq) } }
      .toDF("subspace", "cid", "codeword")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebooks")
    val cents = kc.map { case (cid, w) => (cid, w, l2(w)) }
    val c0 = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
      .withColumn("cq", KMeans.quantize(col("cvec")))
    val enc = Similarity.pqEncode(
      Similarity.withCoarseList(c0, "cvec", "cnorm", cents, "list_id"),
      books, dsub)
    writeCodes(enc.select(col("neighbor_id") +: col("list_id") +:
      col("cnorm") +: (0 until m).map(j => col(s"code$j")): _*),
      dir, ingestBatch, bootstrap = true)
  }

  /** INCREMENTAL maintenance: encode `newRows` with the index's STORED
    * centroids and codebooks (no retraining — the standard IVF contract:
    * fresh vectors ride stale codebooks until the next rebuild, which is
    * scheduled on corpus drift, not on every append) and append their
    * codes to the codes table. One narrow encode pass over the new rows;
    * nothing existing is rewritten. Delivery: with `ingestBatch = None`
    * it is caller-owned — appending the same rows twice duplicates them
    * (pair with a ledger/anti-join upstream, the SNK-idempotency
    * pattern). With `ingestBatch = Some(id)` the codes land under an
    * `ingest_batch=id` partition with dynamic overwrite, so a streaming
    * replay of the same batch is EXACTLY-ONCE (requires the index to
    * have been built with the partitioned layout — see [[buildIvfPq]]).
    */
  def appendIvfPq(newRows: DataFrame, idCol: String, vecCol: String,
      dim: Int, dir: String, ingestBatch: Option[Long] = None): Unit = {
    val spark = newRows.sparkSession
    val (cents, books) = loadConstants(spark, dir, dim)
    val m = books.size
    val dsub = books.head.head._2.length
    val c0 = newRows.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
      .withColumn("cq", KMeans.quantize(col("cvec")))
    val enc = Similarity.pqEncode(
      Similarity.withCoarseList(c0, "cvec", "cnorm", cents, "list_id"),
      books, dsub)
    writeCodes(enc.select(col("neighbor_id") +: col("list_id") +:
      col("cnorm") +: (0 until m).map(j => col(s"code$j")): _*),
      dir, ingestBatch, bootstrap = false)
  }

  private def writeCodes(codes: DataFrame, dir: String,
      ingestBatch: Option[Long], bootstrap: Boolean): Unit = ingestBatch match {
    case Some(id) =>
      // bootstrap: STATIC overwrite truncates the whole codes dir (a
      // rebuild into a dirty directory must not merge with stale
      // appends); append: DYNAMIC overwrite replaces only this batch's
      // partition — the streaming-replay exactly-once contract. An
      // APPENDED batch is coalesced hard: a per-batch partition written
      // at shuffle-partition width lands dozens of sub-row-group files,
      // and every subsequent probe pays per-file open/footer/task setup
      // for ALL accumulated batches — measured as linear per-batch admit
      // growth (~3 s per 32-file batch at 100k corpus) that the data
      // volume itself (≈10³ rows/batch) in no way explains. File COUNT,
      // not row count, is the accumulating term; periodic rebuilds fold
      // all batch partitions back into the bootstrap partition.
      val w = (if (bootstrap) codes else codes.coalesce(4))
        .withColumn("ingest_batch", lit(id))
        .write.mode("overwrite")
      (if (bootstrap) w
       else w.option("partitionOverwriteMode", "dynamic"))
        .partitionBy("ingest_batch")
        .parquet(s"$dir/codes")
    case None =>
      codes.write.mode(if (bootstrap) "overwrite" else "append")
        .parquet(s"$dir/codes")
  }

  /** Top-`k` per query against the index at `dir`. `corpus` supplies ONLY
    * the candidate vectors for the exact rerank (id-joined, small side
    * broadcast) — no training, no encoding, no corpus shuffle.
    */
  /** `scanPred` (over `neighbor_id`) enables FILTERED vector search with
    * PRE-filter semantics: the predicate restricts the codes scan before
    * probing, so the top-k is exact over the qualifying subset (a
    * post-filter of an unfiltered top-k silently loses recall when the
    * filter is selective). The index itself is unchanged — metadata
    * filters compose with the same persisted artifact.
    */
  def queryIvfPq(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nprobe: Int, rerank: Int,
      dir: String, maxQueryRows: Long = 10000,
      scanPred: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    Similarity.guardSmallSide(queries, "AnnIndex.queryIvfPq",
      "sharded query batches", maxQueryRows)
    val spark = corpus.sparkSession
    val (cents, books) = loadConstants(spark, dir, dim)
    val m = books.size
    val dsub = books.head.head._2.length
    var codes = spark.read.parquet(s"$dir/codes")
    scanPred.foreach { p => codes = codes.filter(p) }
    for (j <- books.indices)
      codes = codes.withColumn(s"_recon$j", Similarity.reconCol(books(j), s"code$j"))
    val q0 = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qnorm", VectorFns.norm(col("qvec"), dim))
      .withColumn("qq", KMeans.quantize(col("qvec")))
    val probes = Similarity.probeLists(q0, cents, nprobe)
    val scored = codes.join(broadcast(probes),
        col("neighbor_id") =!= col("query_id") &&
          col("list_id") === col("probe_list"))
      .withColumn("qscore", Similarity.pqScore(m, dsub))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col("neighbor_id").asc)
    // the candidate window shuffles EVERY probed code row — keep its
    // payload narrow (ids + scalars only). Carrying qvec/qnorm here was
    // measured to cost more than the ADC scan saves at a 300k corpus
    // (the dim-floats-per-candidate shuffle dwarfs the rerank it feeds);
    // the query vectors re-join AFTER the rerank cut, on |Q|·rerank rows.
    val cands = scored.withColumn("_qrank", row_number().over(wq))
      .filter(col("_qrank") <= rerank)
      .select(col("query_id"), col("neighbor_id"), col("cnorm"))
      .join(broadcast(q0.select(col("query_id"), col("qvec"), col("qnorm"))),
        Seq("query_id"))
    // candidate-vector fetch: corpus stays the streamed side, candidates
    // broadcast — the only corpus touch in the whole query path
    val fetched = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .join(broadcast(cands), Seq("neighbor_id"))
    Similarity.rerankExactCosine(fetched, dim, k)
  }

  /** Driver-side reload of the two small constant tables, cid-sorted so
    * every tie-break fold replays in the exact order training emitted.
    */
  private def loadConstants(spark: SparkSession, dir: String, dim: Int)
      : (Seq[(Long, Array[Double], Double)], Seq[Seq[(Long, Array[Double])]]) = {
    val cents = spark.read.parquet(s"$dir/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toIndexedSeq
      .map { case (cid, w) => (cid, w, l2(w)) }
    val books = spark.read.parquet(s"$dir/codebooks").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, rows) =>
        rows.sortBy(_._2).toIndexedSeq.map { case (_, cid, cw) => (cid, cw) } }
    val got = books.size * books.head.head._2.length
    require(got == dim, s"index at $dir was built for dim $got, used with $dim")
    (cents, books)
  }

  private def l2(w: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < w.length) { acc += w(i) * w(i); i += 1 }
    math.sqrt(acc)
  }
}
