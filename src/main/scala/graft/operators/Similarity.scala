package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFns

/** Approximate/exact nearest-neighbor search over embedding columns.
  *
  * Scale notes (100 TB):
  * - `cosineTopK` broadcasts the (small) query set against the corpus — the
  *   corpus streams through one stage, never shuffles, and only the per-query
  *   top-k rows cross the final exchange. Norms are precomputed per side so
  *   each candidate pair costs exactly one unrolled dot product inside
  *   whole-stage codegen.
  * - `lshTopK` is the scale path: corpus and queries are bucketed by
  *   deterministic sign-LSH (md5-derived hyperplanes, engine-portable), the
  *   join key is the bucket, and only same-bucket pairs are scored. Recall
  *   trades off with #planes; probing neighboring buckets is the standard
  *   extension.
  */
object Similarity {

  /** Escape hatch for the quadratic/broadcast operators: they refuse (fail
    * fast, before launching the O(n²) job) when the guarded side exceeds
    * `maxRows`. The check reads at most maxRows+1 rows (LocalLimit per
    * partition), so it costs one cheap pass — nothing next to the all-pairs
    * work it gates. Raise `maxRows` explicitly to opt in anyway.
    */
  private[operators] def guardSmallSide(df: DataFrame, op: String,
      scalePath: String, maxRows: Long): Unit = {
    val n = df.limit(math.min(maxRows + 1, Int.MaxValue).toInt).count()
    require(n <= maxRows,
      s"$op is an exact small-corpus form (quadratic / broadcast in this side) " +
        s"and its input exceeds maxRows=$maxRows. At scale use $scalePath, " +
        "or pass a larger maxRows to opt in explicitly.")
  }

  /** Exact top-k cosine neighbors for each query row.
    *
    * @param corpus  (idCol, vecCol) relation to search
    * @param queries (idCol, vecCol) relation of probes (small; broadcast —
    *                guarded by maxQueryRows, since every corpus row is
    *                scored against every query)
    * @param dim     embedding dimensionality
    * @param k       neighbors per query
    * Output: query_id, neighbor_id, cos_sim, rank (1-based; ties broken by
    * neighbor id so results are deterministic).
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, excludeSelf: Boolean = true,
      maxQueryRows: Long = 10000): DataFrame = {
    guardSmallSide(queries, "cosineTopK", "lshTopK or ivfTopK", maxQueryRows)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qnorm", VectorFns.norm(col("qvec"), dim))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
    val scored = joined.withColumn("cos_sim",
      VectorFns.cosineFromNorms(
        VectorFns.dot(col("qvec"), col("cvec"), dim), col("qnorm"), col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** `corpusRel`/`queryRel`, when set, replace the table scan as the
    * corpus/query relation (any SQL exposing ($idCol, $vecCol)) — the
    * exact side of replays whose row sets are not table predicates
    * (e.g. the m16 monitor's seed ∪ admitted corpus). Defaults keep
    * every existing oracle byte-identical.
    */
  def cosineTopKSql(table: String, idCol: String, vecCol: String,
      dim: Int, k: Int, queryPred: String,
      corpusRel: Option[String] = None,
      queryRel: Option[String] = None): String = {
    val dot = VectorFns.dotSql("q.qvec", "c.cvec", dim)
    s"""WITH c AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm
       |  FROM ${corpusRel.map(r => s"($r) _cr").getOrElse(table)}),
       |q AS (
       |  SELECT $idCol AS query_id, $vecCol AS qvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS qnorm
       |  FROM ${queryRel.map(r => s"($r) _qr").getOrElse(s"$table WHERE $queryPred")}),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id,
       |         ($dot) / (q.qnorm * c.cnorm) AS cos_sim
       |  FROM c JOIN q ON c.neighbor_id <> q.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Exact top-k via the typed partial-top-k Aggregator — identical results
    * to `cosineTopK`, but the shuffle carries only per-partition partial
    * top-ks instead of every scored pair (see TopKAggregator).
    */
  def cosineTopKAgg(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, maxQueryRows: Long = 10000): DataFrame = {
    guardSmallSide(queries, "cosineTopKAgg", "lshTopK or ivfTopK", maxQueryRows)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qnorm", VectorFns.norm(col("qvec"), dim))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        VectorFns.cosineFromNorms(
          VectorFns.dot(col("qvec"), col("cvec"), dim),
          col("qnorm"), col("cnorm")).as("cos_sim"))
    val spark = corpus.sparkSession
    import spark.implicits._
    TopKAggregator.topK(scored.as[Scored], k).toDF()
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** Bit-flip index sets for multi-probe LSH at Hamming radius `radius`:
    * Seq() (the bucket itself), every single flip, every pair of flips, …
    * Enumerated at plan-build time — the probe count is a compile-time
    * constant of the operator, so both engines expand the identical list.
    */
  private def flipSets(numPlanes: Int, radius: Int): Seq[Seq[Int]] = {
    def combos(k: Int): Seq[Seq[Int]] =
      (0 until numPlanes).combinations(k).map(_.toSeq).toSeq
    (0 to radius).flatMap(combos)
  }

  private def flipBits(bucket: Column, bits: Seq[Int], numPlanes: Int): Column =
    bits.foldLeft(bucket) { (b, i) =>
      val flipped = when(substring(b, i + 1, 1) === "1", lit("0")).otherwise(lit("1"))
      concat(substring(b, 1, i), flipped, substring(b, i + 2, numPlanes - i - 1))
    }

  private def probeBuckets(bucket: Column, numPlanes: Int, radius: Int): Column =
    array(flipSets(numPlanes, radius).map(flipBits(bucket, _, numPlanes)): _*)

  private def probeBucketsSql(bucket: String, numPlanes: Int, radius: Int): String = {
    def flip(b: String, i: Int): String = {
      val flipped = s"CASE WHEN substr($b, ${i + 1}, 1) = '1' THEN '0' ELSE '1' END"
      s"substr($b, 1, $i) || $flipped || substr($b, ${i + 2}, ${numPlanes - i - 1})"
    }
    flipSets(numPlanes, radius)
      .map(bits => bits.foldLeft(bucket)(flip))
      .mkString("[", ", ", "]")
  }

  /** LSH-bucketed approximate top-k with multi-probe: candidates are scored
    * if they fall in any bucket within Hamming distance `probeRadius` of
    * the query's bucket (single-probe recall on random vectors is poor;
    * multi-probe trades sum(C(numPlanes,r)) bucket lookups for much better
    * recall while still touching a fraction of the corpus — the recall/
    * throughput knobs are numPlanes up, radius up). Same output shape as
    * `cosineTopK`.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, numPlanes: Int,
      probeRadius: Int = 1): DataFrame = {
    val planes = VectorFns.lshPlanes(numPlanes, dim)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("bucket", VectorFns.lshBucket(col("cvec"), planes))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qnorm", VectorFns.norm(col("qvec"), dim))
      .withColumn("probe",
        explode(probeBuckets(VectorFns.lshBucket(col("qvec"), planes),
          numPlanes, probeRadius)))
    val joined = c.join(broadcast(q),
      col("neighbor_id") =!= col("query_id") && c("bucket") === q("probe"))
    val scored = joined.withColumn("cos_sim",
      VectorFns.cosineFromNorms(
        VectorFns.dot(col("qvec"), col("cvec"), dim), col("qnorm"), col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  def lshTopKSql(table: String, idCol: String, vecCol: String,
      dim: Int, k: Int, numPlanes: Int, queryPred: String,
      probeRadius: Int = 1): String = {
    val planes = VectorFns.lshPlanes(numPlanes, dim)
    val dot = VectorFns.dotSql("q.qvec", "c.cvec", dim)
    s"""WITH c AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.lshBucketSql(vecCol, planes)} AS bucket,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm
       |  FROM $table),
       |q0 AS (
       |  SELECT $idCol AS query_id, $vecCol AS qvec,
       |         ${VectorFns.lshBucketSql(vecCol, planes)} AS bucket,
       |         ${VectorFns.normSql(vecCol, dim)} AS qnorm
       |  FROM $table WHERE $queryPred),
       |q AS (
       |  SELECT query_id, qvec, qnorm,
       |         unnest(${probeBucketsSql("bucket", numPlanes, probeRadius)}) AS probe
       |  FROM q0),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id,
       |         ($dot) / (q.qnorm * c.cnorm) AS cos_sim
       |  FROM c JOIN q ON c.neighbor_id <> q.query_id AND c.bucket = q.probe),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |         ROW_NUMBER() OVER (PARTITION BY query_id
       |           ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Collected coarse centroids: (cent_id, weights-as-doubles, L2 norm),
    * sorted by id. The norm is accumulated left-to-right in doubles —
    * the identical IEEE op sequence as `VectorFns.normSql`, so a
    * driver-side constant norm is bit-equal to the oracle's SQL norm.
    */
  private[operators] def collectCentroids(cents: DataFrame, idCol: String,
      vecCol: String): Seq[(Long, Array[Double], Double)] =
    cents.select(col(idCol).cast("long"), col(vecCol)).collect().map { r =>
      val w = r.getSeq[Float](1).toArray.map(_.toDouble)
      var acc = 0.0
      var i = 0
      while (i < w.length) { acc += w(i) * w(i); i += 1 }
      (r.getLong(0), w, math.sqrt(acc))
    }.sortBy(_._1).toIndexedSeq

  /** Staged constant-centroid cosine columns `_s0.._s{n-1}` appended to
    * `side` — one codegen'd DotProductConst loop per centroid, a pure
    * narrow projection (the KMeans.assignNearest pattern).
    */
  private def stagedSims(side: DataFrame, vec: String, nrm: String,
      cents: Seq[(Long, Array[Double], Double)]): DataFrame =
    side.select(col("*") +: cents.zipWithIndex.map { case ((_, w, n2), i) =>
      (graft.plans.DotProductConst(col(vec), w) / (col(nrm) * lit(n2))).as(s"_s$i")
    }: _*)

  /** IVF-style approximate top-k (the inverted-file scale path):
    * - coarse centroids = the first `nlist` corpus vectors (deterministic
    *   seed choice, no Lloyd iterations — parallel double means would be
    *   run-order dependent and break oracle parity); they are collected to
    *   the driver (nlist rows — the same tiny round-trip a Lloyd iteration
    *   makes) and embedded as constants;
    * - every corpus vector is assigned to its nearest centroid by cosine
    *   (tie-break on centroid id) via a STAGED constant-centroid argmax —
    *   one codegen'd dot-product column per centroid folded through
    *   greatest/when, a zero-shuffle narrow projection (no n×nlist row
    *   blowup, no window exchange; the KMeans.assignNearest pattern);
    * - a query probes its `nprobe` nearest centroids (explode the staged
    *   sims, one small window over the query side only) and scores only
    *   those lists' members.
    * At scale the corpus side never shuffles before the final per-query
    * top-k and each query touches ~nprobe/nlist of the data; recall vs.
    * brute force is spec-checked.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val cents = collectCentroids(
      corpus.filter(col(idCol) < nlist), idCol, vecCol)
    require(cents.nonEmpty, s"ivfTopK: no corpus rows with $idCol < $nlist to seed centroids")
    ivfScore(corpus, queries, idCol, vecCol, dim, k, nprobe, cents)
  }

  /** Shared IVF scoring path over a constant centroid table (seeded or
    * k-means-trained): nearest-centroid corpus assignment (narrow staged
    * argmax), query probes, inverted-list cosine top-k.
    */
  /** Append `outCol` = nearest-centroid id BY COSINE to `df` (which carries
    * `vec`/`nrm` columns) — argmax with ROW_NUMBER semantics (sim DESC
    * NULLS LAST, cent_id ASC): greatest() skips nulls; when(null === mx)
    * never fires so a row whose sims are ALL null falls through to the
    * lowest centroid id — exactly where the oracle's NULLS-LAST rank puts
    * it. A zero-shuffle narrow codegen projection; every other column of
    * `df` is carried through.
    */
  private[operators] def withCoarseList(df: DataFrame, vec: String, nrm: String,
      cents: Seq[(Long, Array[Double], Double)], outCol: String): DataFrame = {
    val carried = df.columns.toIndexedSeq
    val staged = stagedSims(df, vec, nrm, cents)
    val simCols = cents.indices.map(i => col(s"_s$i"))
    // O(nlist) argmax: pack the staged sims into ONE array, take the
    // first position achieving the max, look the centroid id up in a
    // constant array. Value-identical to the old greatest/when fold
    // (first-index tie-break, same IEEE comparisons — every oracle
    // unchanged), but the fold was O(nlist²) in expression-TREE size and
    // blew past janino's method limits at nlist=64, falling back to
    // interpreted eval — the documented "expression-tree coarse assign
    // caps nlist" limitation, now lifted.
    val sims = array(simCols: _*)
    val listId = element_at(typedlit(cents.map(_._1)),
      array_position(sims, array_max(sims)).cast("int")).cast("long")
    staged.select(carried.map(col) :+ listId.as(outCol): _*)
  }

  /** Explode each query row (carrying `query_id`/`qvec`/`qnorm` plus any
    * extra columns, all carried through) into its `nprobe` nearest coarse
    * lists as `probe_list`.
    */
  private[operators] def probeLists(q: DataFrame,
      cents: Seq[(Long, Array[Double], Double)], nprobe: Int): DataFrame = {
    val carried = q.columns.toIndexedSeq
    val probeStructs = cents.zipWithIndex.map { case ((cid, _, _), i) =>
      struct(lit(cid).as("probe_list"), col(s"_s$i").as("_csim"))
    }
    val pw = Window.partitionBy(col("query_id"))
      .orderBy(col("_csim").desc, col("probe_list").asc)
    stagedSims(q, "qvec", "qnorm", cents)
      .select(carried.map(col) :+ explode(array(probeStructs: _*)).as("pc"): _*)
      .select(carried.map(col) :+ col("pc.probe_list").as("probe_list") :+
        col("pc._csim").as("_csim"): _*)
      .withColumn("_crank", row_number().over(pw))
      .filter(col("_crank") <= nprobe)
      .drop("_csim", "_crank")
  }

  private[operators] def ivfScore(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dim: Int, k: Int, nprobe: Int,
      cents: Seq[(Long, Array[Double], Double)]): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
    val assigned = withCoarseList(c, "cvec", "cnorm", cents, "list_id")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qnorm", VectorFns.norm(col("qvec"), dim))
    val probes = probeLists(q, cents, nprobe)
    scoreInvertedLists(assigned, probes, dim, k)
  }

  /** Shared IVF tail: score `assigned` (neighbor_id, cvec, cnorm, list_id)
    * against `probes` (query_id, qvec, qnorm, probe_list) — only
    * probed-list members pay a cosine — and keep each query's top k.
    */
  private def scoreInvertedLists(assigned: DataFrame, probes: DataFrame,
      dim: Int, k: Int): DataFrame = {
    val scored = assigned.join(broadcast(probes),
        col("neighbor_id") =!= col("query_id") && col("list_id") === col("probe_list"))
      .withColumn("cos_sim", VectorFns.cosineFromNorms(
        VectorFns.dot(col("qvec"), col("cvec"), dim), col("qnorm"), col("cnorm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** IVF with TRAINED coarse centroids: k-means (engine-exact quantized
    * Lloyd, see KMeans) learns `nlist` centroids, which then play exactly
    * the role of `ivfTopK`'s seeds — corpus rows and query probes are
    * assigned by COSINE (the retrieval metric; cosine is scale-invariant,
    * so the quantized-space centroid means work unrescaled) through the
    * same zero-shuffle staged argmax. Same output contract as `ivfTopK`;
    * recall at equal nlist/nprobe is better because learned centroids
    * partition the data where it actually clusters (spec-checked against
    * brute force vs the first-nlist-ids seeding). `queryPred`-selected ids
    * must match the Spark-side `queries` frame for oracle parity.
    */
  def ivfKMeansTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nlist: Int, iters: Int,
      nprobe: Int): DataFrame = {
    val (_, kc) = KMeans.assignWithCentroids(
      corpus, idCol, vecCol, dim, nlist, iters)
    // centroid components are doubles already; the norm accumulates
    // left-to-right exactly like VectorFns.normSql over the centd relation
    val cents = kc.map { case (cid, w) =>
      var acc = 0.0
      var i = 0
      while (i < w.length) { acc += w(i) * w(i); i += 1 }
      (cid, w, math.sqrt(acc))
    }
    ivfScore(corpus, queries, idCol, vecCol, dim, k, nprobe, cents)
  }

  /** Oracle for `ivfKMeansTopK`: replays the full Lloyd iteration chain
    * (KMeans.assignCtes — bit-identical centroids, e07-proven), then runs
    * the identical IVF cosine scoring over the trained `centd` relation.
    */
  def ivfKMeansTopKSql(table: String, idCol: String, vecCol: String,
      dim: Int, k: Int, nlist: Int, iters: Int, nprobe: Int,
      queryPred: String): String = {
    val (ctes, _) = KMeans.assignCtes(table, idCol, vecCol, dim,
      nlist.toString, iters)
    s"""WITH $ctes,
       |cents AS (
       |  SELECT cluster AS cent_id, cent AS cvec2,
       |         ${VectorFns.normSql("cent", dim)} AS cnorm2
       |  FROM centd$iters),
       |${ivfScoreSql(table, idCol, vecCol, dim, k, nprobe, queryPred)}""".stripMargin
  }

  def ivfTopKSql(table: String, idCol: String, vecCol: String,
      dim: Int, k: Int, nlist: Int, nprobe: Int, queryPred: String): String =
    s"""WITH cents AS (
       |  SELECT $idCol AS cent_id, $vecCol AS cvec2,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm2
       |  FROM $table WHERE $idCol < $nlist),
       |${ivfScoreSql(table, idCol, vecCol, dim, k, nprobe, queryPred)}""".stripMargin

  /** The IVF cosine scoring CTE tail: assumes a `cents(cent_id, cvec2,
    * cnorm2)` relation is already defined by the caller's WITH prefix
    * (seeded rows, or the trained `centd` chain).
    */
  /** SQL snippet: assign each row of `src` its `n` nearest `cents` rows by
    * cosine (ROW_NUMBER argmax — the mirror of `withCoarseList`/
    * `probeLists`), keeping every column of `src`.
    */
  private def nearListSql(src: String, vidCol: String, vec: String,
      nrm: String, n: Int, out: String, dim: Int): String =
    s"""SELECT * EXCLUDE (_csim, _crank) FROM (
       |  SELECT s.*, cent.cent_id AS $out,
       |    ROW_NUMBER() OVER (PARTITION BY s.$vidCol
       |      ORDER BY (${VectorFns.dotSql(s"s.$vec", "cent.cvec2", dim)}) / (s.$nrm * cent.cnorm2) DESC,
       |               cent.cent_id ASC) AS _crank,
       |    1 AS _csim
       |  FROM $src s CROSS JOIN cents cent) WHERE _crank <= $n""".stripMargin

  private def ivfScoreSql(table: String, idCol: String, vecCol: String,
      dim: Int, k: Int, nprobe: Int, queryPred: String): String = {
    def near(src: String, vidCol: String, vec: String, nrm: String, n: Int, out: String) =
      nearListSql(src, vidCol, vec, nrm, n, out, dim)
    s"""c AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm
       |  FROM $table),
       |assigned AS (${near("c", "neighbor_id", "cvec", "cnorm", 1, "list_id")}),
       |q0 AS (
       |  SELECT $idCol AS query_id, $vecCol AS qvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS qnorm
       |  FROM $table WHERE $queryPred),
       |probes AS (${near("q0", "query_id", "qvec", "qnorm", nprobe, "probe_list")}),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id,
       |    (${VectorFns.dotSql("q.qvec", "c.cvec", dim)}) / (q.qnorm * c.cnorm) AS cos_sim
       |  FROM assigned c JOIN probes q
       |    ON c.neighbor_id <> q.query_id AND c.list_id = q.probe_list),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |  FROM scored)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Int8-quantized top-k with exact rerank (the scan-bandwidth scale
    * path): candidate generation scores INT8-QUANTIZED vectors (binary
    * column, 4× smaller than float32 — see `plans.QuantizeI8`) with a pure
    * integer dot product, keeps each query's top `rerank` by quantized
    * score, and reranks only those with the exact float cosine. The full
    * corpus is touched only through its 64-byte quantized form; the
    * 256-byte float vectors are read per-candidate. Same output contract
    * as `cosineTopK`; recall vs brute force is spec-checked, and the
    * oracle replays the identical quantized integers so results are
    * engine-exact regardless of what quantization loses.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, rerank: Int,
      maxQueryRows: Long = 10000): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    guardSmallSide(queries, "quantizedTopK", "lshTopK or ivfTopK", maxQueryRows)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
      .withColumn("cq", graft.plans.QuantizeI8(col("cvec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qnorm", VectorFns.norm(col("qvec"), dim))
      .withColumn("qq", graft.plans.QuantizeI8(col("qvec")))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("qscore", graft.plans.DotProductI8(col("qq"), col("cq")))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col("neighbor_id").asc)
    val cands = scored.withColumn("_qrank", row_number().over(wq))
      .filter(col("_qrank") <= rerank)
    rerankExactCosine(cands, dim, k)
  }

  /** `quantizedTopK` oracle: quantize each side once per row
    * (list_transform, same clip(floor(x*127+0.5)) integers), integer-dot
    * candidates, exact-cosine rerank.
    */
  def quantizedTopKSql(table: String, idCol: String, vecCol: String,
      dim: Int, k: Int, rerank: Int, queryPred: String): String = {
    val quant = s"list_transform($vecCol, x -> GREATEST(-127, LEAST(127, " +
      "CAST(floor(CAST(x AS DOUBLE) * 127.0 + 0.5) AS BIGINT))))"
    val qdot = (1 to dim).map(i => s"q.qq[$i] * c.cq[$i]").mkString(" + ")
    s"""WITH c AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm, $quant AS cq
       |  FROM $table),
       |q AS (
       |  SELECT $idCol AS query_id, $vecCol AS qvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS qnorm, $quant AS qq
       |  FROM $table WHERE $queryPred),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id, q.qvec, c.cvec, q.qnorm, c.cnorm,
       |         ($qdot) AS qscore
       |  FROM c JOIN q ON c.neighbor_id <> q.query_id),
       |cands AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY qscore DESC, neighbor_id ASC) AS _qrank
       |    FROM scored) WHERE _qrank <= $rerank),
       |rer AS (
       |  SELECT query_id, neighbor_id,
       |    (${VectorFns.dotSql("qvec", "cvec", dim)}) / (qnorm * cnorm) AS cos_sim
       |  FROM cands),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |  FROM rer)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Deterministic ±1 Johnson–Lindenstrauss sign matrix (r rows × dim
    * cols) from a splitmix-style integer mix of (j, i) — stateless, so the
    * Spark plan and the oracle SQL embed the SAME literals.
    */
  private[operators] def jlSigns(dim: Int, r: Int): Array[Array[Double]] =
    Array.tabulate(r) { j =>
      Array.tabulate(dim) { i =>
        var z = j.toLong * 0x9E3779B97F4A7C15L +
          i.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
        z ^= z >>> 31; z *= 0xD6E8FEB86659FD93L; z ^= z >>> 27
        if ((z & 1L) == 0L) 1.0 else -1.0
      }
    }

  /** Johnson–Lindenstrauss reduced-dimension top-k with exact rerank —
    * the dimensionality-REDUCTION ANN path (vs e10's precision reduction):
    * each vector is projected once to `r` dims through a deterministic ±1
    * sign matrix (a narrow codegen projection — r DotProductConst columns,
    * zero shuffle), candidates are ranked by cosine IN THE PROJECTED SPACE
    * (r/dim of the scoring arithmetic and bytes: at dim=64, r=16 a 4×
    * smaller scan, and the reduced vectors are what you'd persist), and
    * each query's top `rerank` get the exact float-cosine rerank.
    *
    * Same output contract as `cosineTopK`. Engine-exact: the oracle embeds
    * the same sign literals and replays the same left-associated chains,
    * so results hash-match regardless of what the projection distorts;
    * recall vs brute force is spec-checked (JL: inner products survive
    * sign projections in expectation, so projected-cosine ranking tracks
    * true-cosine ranking).
    */
  def jlTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, r: Int, k: Int, rerank: Int,
      maxQueryRows: Long = 10000): DataFrame = {
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    guardSmallSide(queries, "jlTopK", "lshTopK or ivfTopK", maxQueryRows)
    val signs = jlSigns(dim, r)
    def proj(vec: Column): Column =
      array(signs.map(w => graft.plans.DotProductConst(vec, w)): _*)
    def pnorm(p: Column): Column =
      sqrt((1 to r).map(i => element_at(p, i) * element_at(p, i))
        .reduceLeft(_ + _))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
      .withColumn("cproj", proj(col("cvec")))
      .withColumn("cpnorm", pnorm(col("cproj")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qnorm", VectorFns.norm(col("qvec"), dim))
      .withColumn("qproj", proj(col("qvec")))
      .withColumn("qpnorm", pnorm(col("qproj")))
    val pdot = (1 to r)
      .map(i => element_at(col("qproj"), i) * element_at(col("cproj"), i))
      .reduceLeft(_ + _)
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("qscore", pdot / (col("qpnorm") * col("cpnorm")))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col("neighbor_id").asc)
    val cands = scored.withColumn("_qrank", row_number().over(wq))
      .filter(col("_qrank") <= rerank)
    rerankExactCosine(cands, dim, k)
  }

  /** `jlTopK` oracle: the same ±1 literals, the same left-associated
    * projection / norm / dot chains, projected-cosine candidates,
    * exact-cosine rerank.
    */
  def jlTopKSql(table: String, idCol: String, vecCol: String, dim: Int,
      r: Int, k: Int, rerank: Int, queryPred: String): String = {
    val signs = jlSigns(dim, r)
    def projExpr(vec: String, j: Int): String =
      (0 until dim).map(i =>
        s"CAST($vec[${i + 1}] AS DOUBLE) * ${if (signs(j)(i) > 0) "1.0" else "-1.0"}")
        .mkString("(", " + ", ")")
    def projList(vec: String): String =
      (0 until r).map(j => projExpr(vec, j)).mkString("[", ", ", "]")
    def pnormSql(p: String): String =
      "sqrt(" + (1 to r).map(i => s"$p[$i] * $p[$i]").mkString("(", " + ", ")") + ")"
    val pdot = (1 to r).map(i => s"q.qproj[$i] * c.cproj[$i]")
      .mkString("(", " + ", ")")
    s"""WITH c0 AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm,
       |         ${projList(vecCol)} AS cproj
       |  FROM $table),
       |c AS (SELECT *, ${pnormSql("cproj")} AS cpnorm FROM c0),
       |q0 AS (
       |  SELECT $idCol AS query_id, $vecCol AS qvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS qnorm,
       |         ${projList(vecCol)} AS qproj
       |  FROM $table WHERE $queryPred),
       |q AS (SELECT *, ${pnormSql("qproj")} AS qpnorm FROM q0),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id, q.qvec, c.cvec, q.qnorm, c.cnorm,
       |         ($pdot) / (q.qpnorm * c.cpnorm) AS qscore
       |  FROM c JOIN q ON c.neighbor_id <> q.query_id),
       |cands AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY qscore DESC, neighbor_id ASC) AS _qrank
       |    FROM scored) WHERE _qrank <= $rerank),
       |rer AS (
       |  SELECT query_id, neighbor_id,
       |    (${VectorFns.dotSql("qvec", "cvec", dim)}) / (qnorm * cnorm) AS cos_sim
       |  FROM cands),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |  FROM rer)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** PRODUCT-QUANTIZED top-k with exact rerank — the memory-bound ANN
    * scale path beyond e10's scalar quantization: the vector is split into
    * `m` subspaces of dim/m dims, each subspace gets a `ksub`-entry
    * codebook trained by the engine-exact Lloyd chain (KMeans — the e07
    * machinery, run once per subspace on the corpus's quantized
    * subvectors), and every corpus vector is stored as m small codes
    * (m=8, ksub=16 ⇒ 8 codes replace 64 floats — a 32× smaller scan than
    * float32, 8× smaller than int8). Candidate scoring reconstructs each
    * corpus vector from its codewords and dots it against the quantized
    * query (asymmetric-distance style — the query is NOT quantized to
    * codes, only to fixed-point ints), keeps each query's top `rerank`,
    * and reranks those with the exact float cosine.
    *
    * Same output contract as `cosineTopK`. Engine-exact: the oracle
    * replays the m Lloyd chains (bit-identical codebooks), the same code
    * assignments, and the same left-associated reconstruction dot, so
    * results hash-match regardless of what quantization loses; recall vs
    * brute force is spec-checked separately.
    *
    * Scale: training is m tiny driver loops (k-rows each — the MLlib
    * iteration shape); encoding is a pure narrow codegen projection
    * (staged per-subspace argmin over constant codebooks, zero shuffle);
    * scoring touches the corpus only through its m-code form. At corpus
    * scale this composes with IVF (e09's trained coarse quantizer) as
    * IVF-PQ: coarse cells bound the scan, codes bound the bytes.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, m: Int, ksub: Int, iters: Int, k: Int,
      rerank: Int, maxQueryRows: Long = 10000): DataFrame = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    guardSmallSide(queries, "pqTopK", "lshTopK or ivfKMeansTopK", maxQueryRows)
    val dsub = dim / m
    // one engine-exact codebook per subspace, trained JOINTLY — one
    // aggregation per Lloyd iteration covers all m subspaces (identical
    // arithmetic to m independent runs; quantize-then-slice ≡
    // slice-then-quantize, both elementwise — see trainSubspaceBooks)
    val books = KMeans.trainSubspaceBooks(corpus, idCol, vecCol, dim, m, ksub, iters)
    val cBase = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
      .withColumn("cq", KMeans.quantize(col("cvec")))
    val enc = pqEncode(cBase, books, dsub)
    val q = withLuts(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
        .withColumn("qnorm", VectorFns.norm(col("qvec"), dim))
        .withColumn("qq", KMeans.quantize(col("qvec"))),
      books, dsub)
    val scored = enc.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("qscore", pqScore(m, dsub))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col("neighbor_id").asc)
    val cands = scored.withColumn("_qrank", row_number().over(wq))
      .filter(col("_qrank") <= rerank)
    rerankExactCosine(cands, dim, k)
  }

  /** Append each subspace's staged-argmin code (`code$j`) to `df`, which
    * carries the quantized vector as `cq`. All narrow, all constants,
    * zero shuffle.
    */
  private[operators] def pqEncode(df: DataFrame, books: Seq[Seq[(Long, Array[Double])]],
      dsub: Int): DataFrame = {
    var enc = df
    for (j <- books.indices) {
      enc = KMeans.withNearestCluster(
        enc.withColumn(s"_sub$j", slice(col("cq"), j * dsub + 1, dsub)),
        s"_sub$j", books(j), s"code$j")
    }
    enc
  }

  /** Subspace `j`'s ADC LOOKUP TABLE for one query row: position c+1
    * holds qq_slice_j ⋅ codeword_c (the inner left fold in dim order).
    * Computed ONCE per (query, subspace) — ksub·dsub multiplies — so the
    * corpus-sized scoring below pays m array lookups per candidate
    * instead of re-deriving m·dsub products per row through a ksub-arm
    * codeword decode (the decode allocated a dsub-double array per
    * candidate row — measured as the dominant term of the probed scan).
    * Empty clusters leave 0.0 gap slots that no code ever references
    * (codes were assigned by argmin over existing book entries).
    */
  private[operators] def lutCol(book: Seq[(Long, Array[Double])], j: Int,
      dsub: Int): Column = {
    val byCid = book.toMap
    val maxCid = book.map(_._1).max.toInt
    // DENSE slot table (gaps = zero rows, fold = exactly 0.0), compiled
    // into ONE expression node — a literal-folded array column computed
    // the identical values but cost ~4 s of Catalyst analysis per serve
    // query at m=8/ksub=16 (see plans.AdcLut)
    val dense = Array.tabulate(maxCid + 1)(c =>
      byCid.getOrElse(c.toLong, Array.fill(dsub)(0.0)))
    graft.plans.AdcLut(col("qq"), j * dsub, dense)
  }

  /** Attach every subspace's LUT (`_lut$j`) to a query-side frame that
    * carries the quantized vector as `qq` — ONE select (a withColumn
    * chain re-analyzes the whole growing plan per column).
    */
  private[operators] def withLuts(q: DataFrame,
      books: Seq[Seq[(Long, Array[Double])]], dsub: Int): DataFrame =
    q.select(col("*") +: books.indices.map(j =>
      lutCol(books(j), j, dsub).as(s"_lut$j")): _*)

  /** The asymmetric PQ score via the per-query LUTs: the outer left fold
    * over subspaces of `_lut$j[code$j + 1]` — each LUT entry is itself
    * the inner fold in dim order, so the full parenthesis tree is
    * (subspace-grouped) deterministic and the oracle emits the identical
    * grouping. m lookups + m adds per candidate row.
    */
  private[operators] def pqScore(m: Int, dsub: Int): Column =
    (0 until m).foldLeft(lit(0.0)) { (acc, j) =>
      acc + element_at(col(s"_lut$j"), (col(s"code$j") + 1).cast("int"))
    }

  /** Exact-cosine rerank of a candidate relation carrying (query_id,
    * neighbor_id, qvec, cvec, qnorm, cnorm): top `k` per query.
    */
  private[operators] def rerankExactCosine(cands: DataFrame, dim: Int, k: Int): DataFrame = {
    val wr = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    cands
      .withColumn("cos_sim", VectorFns.cosineFromNorms(
        VectorFns.dot(col("qvec"), col("cvec"), dim), col("qnorm"), col("cnorm")))
      .withColumn("rank", row_number().over(wr).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** IVF-PQ: the full 100 TB ANN architecture in one operator — e09's
    * TRAINED coarse quantizer bounds WHAT is scanned (each query touches
    * ~nprobe/nlist of the corpus) and e11's product codes bound the BYTES
    * per scanned row (m codes instead of dim floats); candidates from the
    * probed lists are scored by the PQ reconstruction dot and the top
    * `rerank` reranked with the exact float cosine. Same output contract
    * as `cosineTopK`; engine-exact (the oracle replays the coarse chain,
    * the m subspace chains, and the identical folds), recall spec-checked.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nlist: Int, itersCoarse: Int,
      nprobe: Int, m: Int, ksub: Int, itersPq: Int, rerank: Int,
      maxQueryRows: Long = 10000): DataFrame = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k)")
    guardSmallSide(queries, "ivfPqTopK", "sharded query batches", maxQueryRows)
    val dsub = dim / m
    val (_, kc) = KMeans.assignWithCentroids(
      corpus, idCol, vecCol, dim, nlist, itersCoarse)
    val cents = kc.map { case (cid, w) =>
      var acc = 0.0
      var i = 0
      while (i < w.length) { acc += w(i) * w(i); i += 1 }
      (cid, w, math.sqrt(acc))
    }
    val books = KMeans.trainSubspaceBooks(corpus, idCol, vecCol, dim, m, ksub, itersPq)
    val c0 = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
      .withColumn("cq", KMeans.quantize(col("cvec")))
    val enc = pqEncode(withCoarseList(c0, "cvec", "cnorm", cents, "list_id"),
      books, dsub)
    val q0 = withLuts(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
        .withColumn("qnorm", VectorFns.norm(col("qvec"), dim))
        .withColumn("qq", KMeans.quantize(col("qvec"))),
      books, dsub)
    val probes = probeLists(q0, cents, nprobe)
    val scored = enc.join(broadcast(probes),
        col("neighbor_id") =!= col("query_id") &&
          col("list_id") === col("probe_list"))
      .withColumn("qscore", pqScore(m, dsub))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qscore").desc, col("neighbor_id").asc)
    val cands = scored.withColumn("_qrank", row_number().over(wq))
      .filter(col("_qrank") <= rerank)
    rerankExactCosine(cands, dim, k)
  }

  /** `pqTopK` oracle: one prefixed Lloyd chain per subspace (bit-identical
    * codebooks and code assignments — the chains' final `assign`/`centd`
    * relations ARE the codes/codewords), then the identical reconstruction
    * dot, candidate rank, and exact-cosine rerank.
    */
  def pqTopKSql(table: String, idCol: String, vecCol: String, dim: Int,
      m: Int, ksub: Int, iters: Int, k: Int, rerank: Int,
      queryPred: String): String = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val dsub = dim / m
    val chains = (0 until m).map { j =>
      val sub = s"(SELECT $idCol AS vid, " +
        s"list_slice($vecCol, ${j * dsub + 1}, ${(j + 1) * dsub}) AS sub FROM $table)"
      KMeans.assignCtes(sub, "vid", "sub", dsub, ksub.toString, iters, s"s${j}_")._1
    }.mkString(",\n")
    val codeJoins = (1 until m)
      .map(j => s"JOIN s${j}_assign$iters a$j ON a0.vec_id = a$j.vec_id")
      .mkString(" ")
    val codeCols = (0 until m).map(j => s"a$j.cluster AS code$j").mkString(", ")
    val reconJoins = (0 until m)
      .map(j => s"JOIN s${j}_centd$iters r$j ON codes.code$j = r$j.cluster")
      .mkString(" ")
    val reconCols = (0 until m).map(j => s"r$j.cent AS recon$j").mkString(", ")
    // subspace-grouped fold, mirroring the engine's ADC LUTs: each inner
    // chain is one LUT entry (dim order), the outer chain adds the m
    // looked-up entries — the parenthesis tree must match the engine's
    // or the last-ulp rounding diverges
    val qscore = (0 until m).foldLeft("0.0") { (acc, j) =>
      val inner = (1 to dsub).foldLeft("0.0") { (iacc, i) =>
        s"($iacc + CAST(q.qq[${j * dsub + i}] AS DOUBLE) * rc.recon$j[$i])"
      }
      s"($acc + $inner)"
    }
    s"""WITH $chains,
       |c AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm
       |  FROM $table),
       |codes AS (
       |  SELECT a0.vec_id AS neighbor_id, $codeCols
       |  FROM s0_assign$iters a0 $codeJoins),
       |rc AS (
       |  SELECT codes.neighbor_id, $reconCols FROM codes $reconJoins),
       |q AS (
       |  SELECT $idCol AS query_id, $vecCol AS qvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS qnorm,
       |         ${KMeans.quantizeSql(vecCol)} AS qq
       |  FROM $table WHERE $queryPred),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id, q.qvec, c.cvec, q.qnorm, c.cnorm,
       |         $qscore AS qscore
       |  FROM c JOIN rc ON c.neighbor_id = rc.neighbor_id
       |  JOIN q ON c.neighbor_id <> q.query_id),
       |cands AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY qscore DESC, neighbor_id ASC) AS _qrank
       |    FROM scored) WHERE _qrank <= $rerank),
       |rer AS (
       |  SELECT query_id, neighbor_id,
       |    (${VectorFns.dotSql("qvec", "cvec", dim)}) / (qnorm * cnorm) AS cos_sim
       |  FROM cands),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |  FROM rer)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** `ivfPqTopK` oracle: the coarse Lloyd chain (unprefixed — same as
    * e09's) feeds the `cents` relation; m prefixed subspace chains feed
    * codes/codewords; assignment, probing, the reconstruction dot, and the
    * exact rerank replay the Spark computation term for term.
    */
  def ivfPqTopKSql(table: String, idCol: String, vecCol: String, dim: Int,
      k: Int, nlist: Int, itersCoarse: Int, nprobe: Int, m: Int, ksub: Int,
      itersPq: Int, rerank: Int, queryPred: String,
      scanPred: Option[String] = None): String = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val dsub = dim / m
    val (coarseCtes, _) = KMeans.assignCtes(table, idCol, vecCol, dim,
      nlist.toString, itersCoarse)
    val pqChains = (0 until m).map { j =>
      val sub = s"(SELECT $idCol AS vid, " +
        s"list_slice($vecCol, ${j * dsub + 1}, ${(j + 1) * dsub}) AS sub FROM $table)"
      KMeans.assignCtes(sub, "vid", "sub", dsub, ksub.toString, itersPq, s"s${j}_")._1
    }.mkString(",\n")
    val codeJoins = (1 until m)
      .map(j => s"JOIN s${j}_assign$itersPq a$j ON a0.vec_id = a$j.vec_id")
      .mkString(" ")
    val codeCols = (0 until m).map(j => s"a$j.cluster AS code$j").mkString(", ")
    val reconJoins = (0 until m)
      .map(j => s"JOIN s${j}_centd$itersPq r$j ON codes.code$j = r$j.cluster")
      .mkString(" ")
    val reconCols = (0 until m).map(j => s"r$j.cent AS recon$j").mkString(", ")
    // subspace-grouped fold, mirroring the engine's ADC LUTs: each inner
    // chain is one LUT entry (dim order), the outer chain adds the m
    // looked-up entries — the parenthesis tree must match the engine's
    // or the last-ulp rounding diverges
    val qscore = (0 until m).foldLeft("0.0") { (acc, j) =>
      val inner = (1 to dsub).foldLeft("0.0") { (iacc, i) =>
        s"($iacc + CAST(q.qq[${j * dsub + i}] AS DOUBLE) * rc.recon$j[$i])"
      }
      s"($acc + $inner)"
    }
    s"""WITH $coarseCtes,
       |cents AS (
       |  SELECT cluster AS cent_id, cent AS cvec2,
       |         ${VectorFns.normSql("cent", dim)} AS cnorm2
       |  FROM centd$itersCoarse),
       |$pqChains,
       |c AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm
       |  FROM $table),
       |assigned AS (${nearListSql("c", "neighbor_id", "cvec", "cnorm", 1, "list_id", dim)}),
       |codes AS (
       |  SELECT a0.vec_id AS neighbor_id, $codeCols
       |  FROM s0_assign$itersPq a0 $codeJoins),
       |rc AS (
       |  SELECT codes.neighbor_id, $reconCols FROM codes $reconJoins),
       |q0 AS (
       |  SELECT $idCol AS query_id, $vecCol AS qvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS qnorm,
       |         ${KMeans.quantizeSql(vecCol)} AS qq
       |  FROM $table WHERE $queryPred),
       |probes AS (${nearListSql("q0", "query_id", "qvec", "qnorm", nprobe, "probe_list", dim)}),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id, q.qvec, c.cvec, q.qnorm, c.cnorm,
       |         $qscore AS qscore
       |  FROM assigned c JOIN rc ON c.neighbor_id = rc.neighbor_id
       |  JOIN probes q ON c.neighbor_id <> q.query_id
       |    AND c.list_id = q.probe_list
       |  ${scanPred.map(p => s"WHERE $p").getOrElse("")}),
       |cands AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY qscore DESC, neighbor_id ASC) AS _qrank
       |    FROM scored) WHERE _qrank <= $rerank),
       |rer AS (
       |  SELECT query_id, neighbor_id,
       |    (${VectorFns.dotSql("qvec", "cvec", dim)}) / (qnorm * cnorm) AS cos_sim
       |  FROM cands),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |  FROM rer)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** `ivfPqTopK` oracle for the STALE-CODEBOOK regime (e19, the
    * AnnIndex.appendIvfPq contract): the coarse quantizer and the m
    * subspace codebooks train ONLY on `trainPred` rows, but EVERY corpus
    * row — including the appended `NOT trainPred` batch — is encoded
    * against those stale books (per-subspace distance argmin, dist ASC /
    * cluster ASC tie-break: exactly KMeans.withNearestCluster's fold) and
    * scanned at query time. This is what build-on-base + append-with-
    * stored-constants + serve computes, replayed term for term: the
    * engine's encode(base at build) ∪ encode(appended at append) equals
    * encode(full corpus with base-trained books) because the persisted
    * constants round-trip exactly and reload cid-sorted (AnnIndex
    * Scaladoc), which is the equality this mirror leans on.
    */
  /** `encodePred` restricts which rows are ENCODED into the replayed
    * index (default: the whole table — the e19 post-append shape);
    * `queryRel`, when set, replaces `$table WHERE $queryPred` as the
    * query relation (any SQL exposing ($idCol, $vecCol) — e.g. a
    * constructed ingest batch that is NOT a table row set); `encodeRel`
    * likewise replaces `$table WHERE $encodePred` as the ENCODED corpus
    * (e.g. seed ∪ an ingest batch's admitted rows — the m16 monitor
    * replay). All default to the original behavior, so e19/e21 oracles
    * are untouched.
    */
  def ivfPqTopKStaleSql(table: String, idCol: String, vecCol: String,
      dim: Int, k: Int, nlist: Int, itersCoarse: Int, nprobe: Int, m: Int,
      ksub: Int, itersPq: Int, rerank: Int, trainPred: String,
      queryPred: String, encodePred: String = "TRUE",
      queryRel: Option[String] = None,
      encodeRel: Option[String] = None): String = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val dsub = dim / m
    val trainTable = s"(SELECT * FROM $table WHERE $trainPred)"
    val (coarseCtes, _) = KMeans.assignCtes(trainTable, idCol, vecCol, dim,
      nlist.toString, itersCoarse)
    val pqChains = (0 until m).map { j =>
      val sub = s"(SELECT $idCol AS vid, " +
        s"list_slice($vecCol, ${j * dsub + 1}, ${(j + 1) * dsub}) AS sub FROM $trainTable)"
      KMeans.assignCtes(sub, "vid", "sub", dsub, ksub.toString, itersPq, s"s${j}_")._1
    }.mkString(",\n")
    // encode the FULL corpus (not the training assignment): nearest stale
    // codeword per subspace, the engine's pqEncode over loaded books
    val encCtes = (0 until m).map { j =>
      val sliceQ = s"list_slice(f.q, ${j * dsub + 1}, ${(j + 1) * dsub})"
      s"""enc$j AS (
         |  SELECT vec_id, cluster AS code$j FROM (
         |    SELECT f.vec_id, c.cluster,
         |      ROW_NUMBER() OVER (PARTITION BY f.vec_id
         |        ORDER BY ${KMeans.distSqSql(sliceQ, "c.cent", dsub)} ASC,
         |                 c.cluster ASC) AS rn
         |    FROM fullq f CROSS JOIN s${j}_centd$itersPq c) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val encJoins = (1 until m)
      .map(j => s"JOIN enc$j ON enc0.vec_id = enc$j.vec_id").mkString(" ")
    val codeCols = (0 until m).map(j => s"enc$j.code$j AS code$j").mkString(", ")
    val reconJoins = (0 until m)
      .map(j => s"JOIN s${j}_centd$itersPq r$j ON codes.code$j = r$j.cluster")
      .mkString(" ")
    val reconCols = (0 until m).map(j => s"r$j.cent AS recon$j").mkString(", ")
    // subspace-grouped fold, mirroring the engine's ADC LUTs: each inner
    // chain is one LUT entry (dim order), the outer chain adds the m
    // looked-up entries — the parenthesis tree must match the engine's
    // or the last-ulp rounding diverges
    val qscore = (0 until m).foldLeft("0.0") { (acc, j) =>
      val inner = (1 to dsub).foldLeft("0.0") { (iacc, i) =>
        s"($iacc + CAST(q.qq[${j * dsub + i}] AS DOUBLE) * rc.recon$j[$i])"
      }
      s"($acc + $inner)"
    }
    s"""WITH $coarseCtes,
       |cents AS (
       |  SELECT cluster AS cent_id, cent AS cvec2,
       |         ${VectorFns.normSql("cent", dim)} AS cnorm2
       |  FROM centd$itersCoarse),
       |$pqChains,
       |fullq AS (
       |  SELECT $idCol AS vec_id, ${KMeans.quantizeSql(vecCol)} AS q
       |  FROM ${encodeRel.map(r => s"($r) _er").getOrElse(s"$table WHERE $encodePred")}),
       |$encCtes,
       |c AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm
       |  FROM ${encodeRel.map(r => s"($r) _er2").getOrElse(s"$table WHERE $encodePred")}),
       |assigned AS (${nearListSql("c", "neighbor_id", "cvec", "cnorm", 1, "list_id", dim)}),
       |codes AS (
       |  SELECT enc0.vec_id AS neighbor_id, $codeCols
       |  FROM enc0 $encJoins),
       |rc AS (
       |  SELECT codes.neighbor_id, $reconCols FROM codes $reconJoins),
       |q0 AS (
       |  SELECT $idCol AS query_id, $vecCol AS qvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS qnorm,
       |         ${KMeans.quantizeSql(vecCol)} AS qq
       |  FROM ${queryRel.map(r => s"($r) _qr").getOrElse(s"$table WHERE $queryPred")}),
       |probes AS (${nearListSql("q0", "query_id", "qvec", "qnorm", nprobe, "probe_list", dim)}),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id, q.qvec, c.cvec, q.qnorm, c.cnorm,
       |         $qscore AS qscore
       |  FROM assigned c JOIN rc ON c.neighbor_id = rc.neighbor_id
       |  JOIN probes q ON c.neighbor_id <> q.query_id
       |    AND c.list_id = q.probe_list),
       |cands AS (
       |  SELECT * FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY qscore DESC, neighbor_id ASC) AS _qrank
       |    FROM scored) WHERE _qrank <= $rerank),
       |rer AS (
       |  SELECT query_id, neighbor_id,
       |    (${VectorFns.dotSql("qvec", "cvec", dim)}) / (qnorm * cnorm) AS cos_sim
       |  FROM cands),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_sim,
       |    ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |  FROM rer)
       |SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= $k""".stripMargin
  }

  /** Relational replay of the PQ ENCODE of `rowsRel`'s vectors under
    * codebooks trained on `$table WHERE $trainPred` (the stale-codebook
    * contract of [[graft.operators.AnnIndex.appendIvfPq]]), rolled up as
    * the per-list codes MANIFEST: (list_id, n_codes, id_checksum,
    * code0_checksum). This is the oracle for an ingest pipeline's "what
    * exactly was appended to the index this batch" audit — the id sums
    * prove membership, the code0 sum proves the appended rows carry the
    * stale-encode PQ codes (transitively pinning the whole encode chain:
    * code0 is the same argmin fold as every other subspace).
    * `rowsRel` is any SQL exposing ($idCol, $vecCol).
    */
  def pqListManifestSql(table: String, idCol: String, vecCol: String,
      dim: Int, nlist: Int, itersCoarse: Int, m: Int, ksub: Int,
      itersPq: Int, trainPred: String, rowsRel: String): String = {
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val dsub = dim / m
    val trainTable = s"(SELECT * FROM $table WHERE $trainPred)"
    val (coarseCtes, _) = KMeans.assignCtes(trainTable, idCol, vecCol, dim,
      nlist.toString, itersCoarse)
    val pqChains = (0 until m).map { j =>
      val sub = s"(SELECT $idCol AS vid, " +
        s"list_slice($vecCol, ${j * dsub + 1}, ${(j + 1) * dsub}) AS sub FROM $trainTable)"
      KMeans.assignCtes(sub, "vid", "sub", dsub, ksub.toString, itersPq, s"s${j}_")._1
    }.mkString(",\n")
    val encCtes = (0 until m).map { j =>
      val sliceQ = s"list_slice(f.q, ${j * dsub + 1}, ${(j + 1) * dsub})"
      s"""enc$j AS (
         |  SELECT vec_id, cluster AS code$j FROM (
         |    SELECT f.vec_id, c.cluster,
         |      ROW_NUMBER() OVER (PARTITION BY f.vec_id
         |        ORDER BY ${KMeans.distSqSql(sliceQ, "c.cent", dsub)} ASC,
         |                 c.cluster ASC) AS rn
         |    FROM fullq f CROSS JOIN s${j}_centd$itersPq c) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $coarseCtes,
       |cents AS (
       |  SELECT cluster AS cent_id, cent AS cvec2,
       |         ${VectorFns.normSql("cent", dim)} AS cnorm2
       |  FROM centd$itersCoarse),
       |$pqChains,
       |fullq AS (
       |  SELECT $idCol AS vec_id, ${KMeans.quantizeSql(vecCol)} AS q
       |  FROM ($rowsRel) _rr),
       |$encCtes,
       |c AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm
       |  FROM ($rowsRel) _rr),
       |assigned AS (${nearListSql("c", "neighbor_id", "cvec", "cnorm", 1, "list_id", dim)})
       |SELECT a.list_id, COUNT(*) AS n_codes,
       |  CAST(SUM(a.neighbor_id) AS BIGINT) AS id_checksum,
       |  CAST(SUM(e.code0) AS BIGINT) AS code0_checksum
       |FROM assigned a JOIN enc0 e ON e.vec_id = a.neighbor_id
       |GROUP BY a.list_id""".stripMargin
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, id_a < id_b.
    * Exact all-pairs (O(n²)) SMALL-CORPUS form — refuses corpora over
    * `maxRows`; the scale path is `lshNearDupPairs` (same output shape,
    * bucketed candidates).
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, maxRows: Long = 100000): DataFrame = {
    guardSmallSide(df, "cosineNearDupPairs", "lshNearDupPairs", maxRows)
    // the O(n²) dot products run in the BNL join's STREAMED-side tasks —
    // spread that side or an underpartitioned local scan serializes the
    // whole quadratic scoring on one core (util.Spread: no-op at scale)
    val a = graft.util.Spread(df)
      .select(col(idCol).as("id_a"), col(vecCol).as("avec"))
      .withColumn("anorm", VectorFns.norm(col("avec"), dim))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("bvec"))
      .withColumn("bnorm", VectorFns.norm(col("bvec"), dim))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim", VectorFns.cosineFromNorms(
        VectorFns.dot(col("avec"), col("bvec"), dim), col("anorm"), col("bnorm")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos_sim"))
  }

  /** Scale path for near-dup pairs: only same-LSH-bucket pairs are scored
    * (bucket join instead of all-pairs BNLJ). Returns a subset of
    * `cosineNearDupPairs` — the recall/throughput tradeoff knob is
    * numPlanes.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, numPlanes: Int): DataFrame = {
    val planes = VectorFns.lshPlanes(numPlanes, dim)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("bucket", VectorFns.lshBucket(col("vec"), planes))
      .withColumn("nrm", VectorFns.norm(col("vec"), dim))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .withColumn("cos_sim", VectorFns.cosineFromNorms(
        VectorFns.dot(col("a.vec"), col("b.vec"), dim), col("a.nrm"), col("b.nrm")))
      .filter(col("cos_sim") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos_sim"))
  }

  def lshNearDupPairsSql(table: String, idCol: String, vecCol: String,
      dim: Int, threshold: Double, numPlanes: Int): String = {
    val planes = VectorFns.lshPlanes(numPlanes, dim)
    s"""WITH v AS (
       |  SELECT $idCol AS id, $vecCol AS vec,
       |         ${VectorFns.lshBucketSql(vecCol, planes)} AS bucket,
       |         ${VectorFns.normSql(vecCol, dim)} AS nrm
       |  FROM $table)
       |SELECT a.id AS id_a, b.id AS id_b,
       |  (${VectorFns.dotSql("a.vec", "b.vec", dim)}) / (a.nrm * b.nrm) AS cos_sim
       |FROM v a JOIN v b ON a.bucket = b.bucket AND a.id < b.id
       |WHERE (${VectorFns.dotSql("a.vec", "b.vec", dim)}) / (a.nrm * b.nrm) >= $threshold""".stripMargin
  }

  def cosineNearDupPairsSql(table: String, idCol: String, vecCol: String,
      dim: Int, threshold: Double): String =
    s"""WITH v AS (
       |  SELECT $idCol AS id, $vecCol AS vec, ${VectorFns.normSql(vecCol, dim)} AS nrm
       |  FROM $table)
       |SELECT a.id AS id_a, b.id AS id_b,
       |       (${VectorFns.dotSql("a.vec", "b.vec", dim)}) / (a.nrm * b.nrm) AS cos_sim
       |FROM v a JOIN v b ON a.id < b.id
       |WHERE (${VectorFns.dotSql("a.vec", "b.vec", dim)}) / (a.nrm * b.nrm) >= $threshold""".stripMargin

  /** Recall@k of an approximate top-k result against the exact one — the
    * evaluation harness every ANN deployment ships with (you don't tune
    * nlist/nprobe/planes by feel). Both inputs are (query_id, neighbor_id,
    * …rank ≤ k) relations; output is one row per query (hits, recall) plus
    * the exact set size. Join on (query_id, neighbor_id), count matches,
    * divide — two small relations (|Q|·k rows), one broadcast join, one
    * aggregation; cost is independent of corpus size.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(broadcast(approx.select(col("query_id"), col("neighbor_id"))),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"), col("n_exact"),
        (coalesce(col("hits"), lit(0L)).cast("double") /
          col("n_exact").cast("double")).as("recall"))
  }

  /** DuckDB mirror of [[recallAtK]] over two full SELECT statements. */
  def recallAtKSql(approxSql: String, exactSql: String): String =
    s"""WITH approx AS ($approxSql),
       |exact AS ($exactSql),
       |hits AS (
       |  SELECT e.query_id, COUNT(*) AS hits
       |  FROM exact e
       |  WHERE EXISTS (SELECT 1 FROM approx a
       |    WHERE a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id)
       |  GROUP BY 1),
       |n AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY 1)
       |SELECT n.query_id, COALESCE(h.hits, 0) AS hits, n.n_exact,
       |  CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(n.n_exact AS DOUBLE) AS recall
       |FROM n LEFT JOIN hits h ON n.query_id = h.query_id""".stripMargin

  /** Maximal Marginal Relevance rerank — diversity-aware retrieval, the
    * standard RAG-context selection step. From each query's `cands`
    * cosine-nearest candidates, greedily select `k`:
    * step 1 takes the most relevant; each later step takes
    * argmax λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s), ties to the smaller id
    * — relevance traded against redundancy with what's already selected,
    * so five near-identical top hits can't crowd out the fifth distinct
    * aspect.
    *
    * Plan shape: candidate generation is e01's broadcast scan (corpus
    * streams, one exchange of |Q|·cands rows); vectors ride back on one
    * more broadcast join; the greedy selection then runs per-query INSIDE
    * `flatMapGroups` — O(k·cands·dim) local work on O(cands·dim) state,
    * bounded by construction, zero further shuffle. The candidate set per
    * query is small BY CONTRACT (it's a rerank), which is what makes the
    * sequential greedy loop a legitimate local step rather than a
    * driver-side collect.
    *
    * Engine-exactness: every similarity is the same sequential
    * double-accumulated dot product the scans use (DotProductFloat's loop,
    * replicated verbatim here), scores combine in the same literal order
    * as the oracle's unrolled-CTE replay, and the running max over the
    * selected set is order-independent — so ranks AND scores hash-match.
    */
  def mmrTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, cands: Int, k: Int, lambda: Double,
      maxQueryRows: Long = 10000): DataFrame = {
    require(k >= 1 && cands >= k, s"need cands=$cands >= k=$k >= 1")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda=$lambda out of [0,1]")
    val top = cosineTopK(corpus, queries, idCol, vecCol, dim, cands,
      excludeSelf = true, maxQueryRows)
    val withVec = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"))
      .join(broadcast(top), Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("nvec"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val rows = withVec.as[(Long, Long, Double, Array[Float])]
    rows.groupByKey(_._1).flatMapGroups { (qid, it) =>
      // DotProductFloat's exact accumulation order, replicated
      def dot(a: Array[Float], b: Array[Float]): Double = {
        val n = math.min(a.length, b.length)
        var acc = 0.0; var i = 0
        while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
        acc
      }
      val cs = it.toArray
      val norms = cs.map(c => math.sqrt(dot(c._4, c._4)))
      val picked = new Array[Boolean](cs.length)
      // true max over the selected set — may be NEGATIVE (anti-correlated
      // candidate); only the empty set (step 1) contributes 0.0. Clamping
      // at 0 would silently stop rewarding anti-correlated picks.
      val maxSimToSel = Array.fill(cs.length)(Double.NegativeInfinity)
      val out = Seq.newBuilder[(Long, Long, Long, Double)]
      for (step <- 1 to math.min(k, cs.length)) {
        var best = -1
        var bestScore = Double.NegativeInfinity
        for (i <- cs.indices if !picked(i)) {
          val ms = if (maxSimToSel(i) == Double.NegativeInfinity) 0.0
            else maxSimToSel(i)
          val s = lambda * cs(i)._3 - (1 - lambda) * ms
          if (best == -1 || s > bestScore ||
              (s == bestScore && cs(i)._2 < cs(best)._2)) {
            best = i; bestScore = s
          }
        }
        picked(best) = true
        out += ((qid, cs(best)._2, step.toLong, bestScore))
        for (i <- cs.indices if !picked(i)) {
          val sim = dot(cs(i)._4, cs(best)._4) / (norms(i) * norms(best))
          if (sim > maxSimToSel(i)) maxSimToSel(i) = sim
        }
      }
      out.result()
    }.toDF("query_id", "neighbor_id", "mmr_rank", "mmr_score")
  }

  /** DuckDB mirror of [[mmrTopK]]: e01's candidate replay, the candidate
    * pair-similarity matrix, then `k` unrolled greedy-selection CTEs (the
    * pagerank-style fixed-step replay). `sel0` is the empty selected set,
    * so step 1 falls out of the same template (COALESCE(maxsim, 0.0)).
    * Chained CTEs are MATERIALIZED: sel{t-1} is referenced three times per
    * step, so default inlining re-expands the whole prefix ~3^k-fold
    * (39 s at k=5 on sf0.01; ~1 s materialized). Same results either way.
    */
  def mmrTopKSql(table: String, idCol: String, vecCol: String, dim: Int,
      cands: Int, k: Int, lambda: Double, queryPred: String): String = {
    // CAST to DOUBLE: a bare 0.7 literal is DECIMAL in DuckDB, so
    // (1.0 - 0.7) would be an EXACT 0.3 (→ double 0.29999…) while Scala's
    // 1 - 0.7 is IEEE 0.30000000000000004 — a last-ulp score divergence.
    val l = s"CAST(${lambda.toString} AS DOUBLE)"
    val score = s"$l * cv.cos_sim - (1.0 - $l) * COALESCE(m.maxsim, 0.0)"
    val steps = (1 to k).map { t =>
      s"""pick$t AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, CAST($t AS BIGINT) AS mmr_rank,
         |    mmr_score
         |  FROM (
         |    SELECT cv.query_id, cv.neighbor_id, $score AS mmr_score,
         |      ROW_NUMBER() OVER (PARTITION BY cv.query_id
         |        ORDER BY ($score) DESC, cv.neighbor_id ASC) AS rn
         |    FROM cv
         |    LEFT JOIN (
         |      SELECT p.query_id, p.ia AS neighbor_id, MAX(p.sim) AS maxsim
         |      FROM pair p JOIN sel${t - 1} s
         |        ON p.query_id = s.query_id AND p.ib = s.neighbor_id
         |      GROUP BY 1, 2) m
         |      ON cv.query_id = m.query_id AND cv.neighbor_id = m.neighbor_id
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${t - 1} s
         |      WHERE s.query_id = cv.query_id
         |        AND s.neighbor_id = cv.neighbor_id))
         |  WHERE rn = 1),
         |sel$t AS MATERIALIZED (SELECT query_id, neighbor_id FROM sel${t - 1}
         |  UNION ALL SELECT query_id, neighbor_id FROM pick$t)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to k)
      .map(t => s"SELECT * FROM pick$t").mkString("\nUNION ALL ")
    s"""WITH c AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm
       |  FROM $table),
       |q AS (
       |  SELECT $idCol AS query_id, $vecCol AS qvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS qnorm
       |  FROM $table WHERE $queryPred),
       |scored AS (
       |  SELECT q.query_id, c.neighbor_id, c.cvec, c.cnorm,
       |         (${VectorFns.dotSql("q.qvec", "c.cvec", dim)})
       |           / (q.qnorm * c.cnorm) AS cos_sim
       |  FROM c JOIN q ON c.neighbor_id <> q.query_id),
       |cv AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, cvec, cnorm, cos_sim FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
       |    FROM scored)
       |  WHERE rank <= $cands),
       |pair AS MATERIALIZED (
       |  SELECT a.query_id, a.neighbor_id AS ia, b.neighbor_id AS ib,
       |    (${VectorFns.dotSql("a.cvec", "b.cvec", dim)})
       |      / (a.cnorm * b.cnorm) AS sim
       |  FROM cv a JOIN cv b
       |    ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id),
       |sel0 AS (
       |  SELECT CAST(NULL AS BIGINT) AS query_id,
       |         CAST(NULL AS BIGINT) AS neighbor_id
       |  WHERE FALSE),
       |$steps
       |$unionAll""".stripMargin
  }
}
