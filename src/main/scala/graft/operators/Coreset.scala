package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFns
import graft.plans.DotProductConst

/** Diversity-coreset selection over an embedding corpus: greedy k-center
  * (Gonzalez farthest-point traversal) — the data-selection step that picks a
  * maximally spread subset of documents for curation/eval, the complement of
  * SemDeDup's "drop the redundant" (reference has no analog; this is part of
  * the LLM-pipeline extension surface, like e08/e13).
  *
  * Algorithm: seed with the lowest id (deterministic), then k−1 times pick the
  * point whose maximum cosine similarity to the already-selected set is
  * LOWEST (= farthest in cosine distance), ties to the smaller id.
  *
  * Plan shape (the 100 TB story): each round is
  *   1. one NARROW codegen projection over the corpus — cosine similarity to
  *      each already-picked center via [[DotProductConst]] (centers are
  *      driver-side constants, like KMeans.assignNearest), folded with
  *      `greatest(...)`; zero shuffle, zero join;
  *   2. one `orderBy(...).limit(1)` argmin — TakeOrderedAndProject, a 1-row
  *      per-partition reduction to the driver (KMeans' k-row round-trip
  *      shape, not a collect of data).
  * The corpus is never self-joined and never shuffled; total work is
  * O(k·n·dim) narrow math + k single-row reductions. At scale the corpus
  * relation should be cached by the caller across rounds; the per-round
  * expression is rebuilt from ALL constants each time, so lineage depth per
  * job stays 1 (no accumulated iterative plan).
  *
  * Engine-exactness vs the DuckDB oracle ([[kCenterSampleSql]]): every
  * similarity is the same left-to-right IEEE double accumulation
  * (DotProductConst's loop ≡ the oracle's literal CAST(a[i] AS
  * DOUBLE)*CAST(b[i] AS DOUBLE) chain); the running max over the selected set
  * is order-independent; center norms are computed driver-side with the same
  * sequential loop the SQL sqrt-of-chain evaluates — so ids, ranks AND scores
  * hash-match with no tolerance.
  */
object Coreset {

  /** Returns exactly `min(k, n)` rows: (center_id, pick_rank, score) where
    * score is the picked point's max cosine similarity to the previously
    * selected set (0.0 for the seed, mirroring MMR's empty-set convention).
    */
  def kCenterSample(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val spark = df.sparkSession
    val base = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))

    def seqDot(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var acc = 0.0; var i = 0
      while (i < n) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }

    // picked: (id, vecAsDoubles, norm)
    var picked = List.empty[(Long, Array[Double], Double)]
    val out = Seq.newBuilder[(Long, Long, Double)]

    // Seed: lowest id. TakeOrdered — no full sort.
    val seedRow = base.orderBy(col("id").asc).limit(1).collect()(0)
    val seedVec = seedRow.getSeq[Float](1).toArray
    picked ::= ((seedRow.getLong(0), seedVec.map(_.toDouble),
      math.sqrt(seqDot(seedVec, seedVec))))
    out += ((seedRow.getLong(0), 1L, 0.0))

    for (step <- 2 to k) {
      val pickedIds = picked.map(_._1)
      // max cosine sim to the selected set, all centers as compiled-in
      // constants — one narrow projection, no join, no shuffle.
      val sims: Seq[Column] = picked.map { case (_, w, nrm) =>
        DotProductConst(col("v"), w) /
          (VectorFns.norm(col("v"), dim) * lit(nrm))
      }
      val maxSim = if (sims.size == 1) sims.head else greatest(sims: _*)
      val cand = base
        .filter(!col("id").isin(pickedIds: _*))
        .select(col("id"), col("v"), maxSim.as("maxsim"))
        .orderBy(col("maxsim").asc, col("id").asc)
        .limit(1)
        .collect()
      if (cand.nonEmpty) {
        val r = cand(0)
        val vec = r.getSeq[Float](1).toArray
        picked ::= ((r.getLong(0), vec.map(_.toDouble),
          math.sqrt(seqDot(vec, vec))))
        out += ((r.getLong(0), step.toLong, r.getDouble(2)))
      }
    }

    import spark.implicits._
    out.result().toDF("center_id", "pick_rank", "score")
  }

  /** DuckDB mirror: k unrolled greedy argmin CTEs (the e13/MMR replay
    * shape). `sel0` is empty so the seed falls out of ORDER BY id.
    * Every chained CTE is MATERIALIZED: each `sel{t}` is referenced three
    * times by step t+1, so default inlining would expand the chain
    * 3^k-fold (minutes at k=8); materialization keeps the replay linear.
    */
  def kCenterSampleSql(table: String, idCol: String, vecCol: String,
      dim: Int, k: Int): String = {
    val steps = (2 to k).map { t =>
      s"""pick$t AS MATERIALIZED (
         |  SELECT center_id, CAST($t AS BIGINT) AS pick_rank, score FROM (
         |    SELECT mx.id AS center_id, mx.maxsim AS score,
         |      ROW_NUMBER() OVER (ORDER BY mx.maxsim ASC, mx.id ASC) AS rn
         |    FROM (
         |      SELECT cx.id,
         |        MAX((${VectorFns.dotSql("cx.v", "cs.v", dim)})
         |            / (cx.nrm * cs.nrm)) AS maxsim
         |      -- centers first via an equi-join (<= k rows), THEN the
         |      -- cross with the corpus: an IN-predicate in the ON clause
         |      -- planned as full n x n before filtering blows DuckDB's
         |      -- temp disk at scale
         |      FROM c cx CROSS JOIN (
         |        SELECT cc.id, cc.v, cc.nrm
         |        FROM c cc JOIN sel${t - 1} s ON cc.id = s.center_id) cs
         |      WHERE cx.id NOT IN (SELECT center_id FROM sel${t - 1})
         |      GROUP BY cx.id) mx)
         |  WHERE rn = 1),
         |sel$t AS MATERIALIZED (SELECT center_id FROM sel${t - 1}
         |  UNION ALL SELECT center_id FROM pick$t)""".stripMargin
    }.mkString(",\n")
    val unionAll = (1 to k)
      .map(t => s"SELECT * FROM pick$t").mkString("\nUNION ALL ")
    s"""WITH c AS MATERIALIZED (
       |  SELECT CAST($idCol AS BIGINT) AS id, $vecCol AS v,
       |         ${VectorFns.normSql(vecCol, dim)} AS nrm
       |  FROM $table),
       |pick1 AS MATERIALIZED (
       |  SELECT id AS center_id, CAST(1 AS BIGINT) AS pick_rank,
       |         CAST(0.0 AS DOUBLE) AS score
       |  FROM (SELECT id, ROW_NUMBER() OVER (ORDER BY id ASC) AS rn FROM c)
       |  WHERE rn = 1),
       |sel1 AS MATERIALIZED (SELECT center_id FROM pick1),
       |$steps
       |$unionAll""".stripMargin
  }
}
