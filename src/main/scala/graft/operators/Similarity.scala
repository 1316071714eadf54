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

  def cosineTopKSql(table: String, idCol: String, vecCol: String,
      dim: Int, k: Int, queryPred: String): String = {
    val dot = VectorFns.dotSql("q.qvec", "c.cvec", dim)
    s"""WITH c AS (
       |  SELECT $idCol AS neighbor_id, $vecCol AS cvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm
       |  FROM $table),
       |q AS (
       |  SELECT $idCol AS query_id, $vecCol AS qvec,
       |         ${VectorFns.normSql(vecCol, dim)} AS qnorm
       |  FROM $table WHERE $queryPred),
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

  /** IVF-style approximate top-k (the inverted-file scale path):
    * - coarse centroids = the first `nlist` corpus vectors (deterministic
    *   seed choice, no Lloyd iterations — parallel double means would be
    *   run-order dependent and break oracle parity);
    * - every corpus vector is assigned to its nearest centroid by cosine
    *   (tie-break on centroid id) → an inverted list per centroid;
    * - a query probes its `nprobe` nearest centroids and scores only those
    *   lists' members.
    * At scale the corpus shuffles once on list id and each query touches
    * nprobe/nlist of the data; recall vs. brute force is spec-checked.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val cents = broadcast(
      corpus.filter(col(idCol) < nlist)
        .select(col(idCol).as("cent_id"), col(vecCol).as("cvec2"))
        .withColumn("cnorm2", VectorFns.norm(col("cvec2"), dim)))

    def nearestCentroids(side: DataFrame, vec: String, nrm: String, n: Int,
        outCol: String): DataFrame = {
      val w = Window.partitionBy(col("_vid"))
        .orderBy(col("_csim").desc, col("cent_id").asc)
      side.crossJoin(cents)
        .withColumn("_csim", VectorFns.cosineFromNorms(
          VectorFns.dot(col(vec), col("cvec2"), dim), col(nrm), col("cnorm2")))
        .withColumn("_crank", row_number().over(w))
        .filter(col("_crank") <= n)
        .withColumnRenamed("cent_id", outCol)
        .drop("cvec2", "cnorm2", "_csim", "_crank")
    }

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
      .withColumn("cnorm", VectorFns.norm(col("cvec"), dim))
      .withColumn("_vid", col("neighbor_id"))
    val assigned = nearestCentroids(c, "cvec", "cnorm", 1, "list_id").drop("_vid")

    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
      .withColumn("qnorm", VectorFns.norm(col("qvec"), dim))
      .withColumn("_vid", col("query_id"))
    val probes = nearestCentroids(q, "qvec", "qnorm", nprobe, "probe_list").drop("_vid")

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

  def ivfTopKSql(table: String, idCol: String, vecCol: String,
      dim: Int, k: Int, nlist: Int, nprobe: Int, queryPred: String): String = {
    def near(src: String, vidCol: String, vec: String, nrm: String, n: Int, out: String) =
      s"""SELECT * EXCLUDE (_csim, _crank) FROM (
         |  SELECT s.*, cent.cent_id AS $out,
         |    ROW_NUMBER() OVER (PARTITION BY s.$vidCol
         |      ORDER BY (${VectorFns.dotSql(s"s.$vec", "cent.cvec2", dim)}) / (s.$nrm * cent.cnorm2) DESC,
         |               cent.cent_id ASC) AS _crank,
         |    1 AS _csim
         |  FROM $src s CROSS JOIN cents cent) WHERE _crank <= $n""".stripMargin
    s"""WITH cents AS (
       |  SELECT $idCol AS cent_id, $vecCol AS cvec2,
       |         ${VectorFns.normSql(vecCol, dim)} AS cnorm2
       |  FROM $table WHERE $idCol < $nlist),
       |c AS (
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

  /** Embedding near-duplicate pairs: cosine >= threshold, id_a < id_b.
    * Exact all-pairs (O(n²)) SMALL-CORPUS form — refuses corpora over
    * `maxRows`; the scale path is `lshNearDupPairs` (same output shape,
    * bucketed candidates).
    */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double, maxRows: Long = 100000): DataFrame = {
    guardSmallSide(df, "cosineNearDupPairs", "lshNearDupPairs", maxRows)
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("avec"))
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
}
