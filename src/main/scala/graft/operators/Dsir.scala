package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** DSIR-style data selection via importance resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): score
  * every document by the log-likelihood ratio of a TARGET bag-of-hashed-
  * unigrams model over the RAW corpus model, then keep the highest-weight
  * documents — the standard trick for tilting a 100 TB crawl toward a
  * high-quality target domain without training a classifier.
  *
  * Engine-exact discipline: features are `md5Hash32(term) mod buckets`
  * (the portable 32-bit hash), both models are exact integer counts with
  * add-1 smoothing, each bucket's two log terms are rounded to 6dp and
  * carried as DECIMAL(18,6) so the per-document dot product
  * `sum(cnt * w)` is EXACT decimal arithmetic (partition-order-independent);
  * only the final display cast is double (the t34/q44 discipline).
  *
  * Scale (100 TB): the corpus is exploded ONCE into (doc, bucket) counts
  * with map-side combine; both n-gram models are `buckets`-bounded
  * aggregates of that relation; the weight table is at most `buckets` rows
  * (2^20 buckets ≈ 8 MB — always broadcastable), so scoring is a broadcast
  * hash join plus one per-doc aggregation. Nothing quadratic, no corpus
  * re-shuffle beyond the feature count, and the top-K is TakeOrdered
  * (per-partition heaps), never a global sort.
  */
object Dsir {

  private def d6(c: Column): Column = round(c, 6).cast("decimal(18,6)")

  /** (doc, bucket) exact feature counts — the single pass over the corpus
    * both models and the scorer reuse.
    */
  private def feats(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .withColumn("bucket", pmod(TextFns.md5Hash32(col("term")), lit(buckets.toLong)))
      .groupBy(col("doc_id"), col("source"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-bucket importance weight w = ln p_target(b) − ln p_raw(b), add-1
    * smoothed, as the exact 6dp-decimal difference. At most `buckets` rows.
    */
  private def weights(f: DataFrame, targetSource: String, buckets: Int): DataFrame = {
    val byBucket = f.groupBy(col("bucket")).agg(
      sum(col("cnt")).as("rc"),
      sum(when(col("source") === lit(targetSource), col("cnt"))
        .otherwise(lit(0L))).as("tc"))
    val totals = byBucket.agg(
      sum(col("rc")).as("rtot"), sum(col("tc")).as("ttot"))
    byBucket.crossJoin(broadcast(totals)).select(
      col("bucket"),
      (d6(log((col("tc") + 1).cast("double") /
              (col("ttot") + buckets).cast("double"))) -
       d6(log((col("rc") + 1).cast("double") /
              (col("rtot") + buckets).cast("double")))).as("w"))
  }

  /** Top-`topK` documents by DSIR importance score (deterministic variant:
    * ties broken by doc_id, so the selected set is exact in both engines).
    */
  def topByImportance(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, targetSource: String, buckets: Int = 512,
      topK: Int = 100): DataFrame = {
    require(buckets > 0, s"buckets ($buckets) must be positive")
    require(topK > 0, s"topK ($topK) must be positive")
    val f = feats(docs, idCol, textCol, sourceCol, buckets)
    f.join(broadcast(weights(f, targetSource, buckets)), Seq("bucket"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("cnt") * col("w")).as("sw"))
      .select(col("doc_id"), col("source"),
        round(col("sw").cast("double"), 6).as("dsir_score"))
      .orderBy(col("dsir_score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** [[topByImportance]] oracle: identical tokenization, hash-bucketing,
    * smoothing, 6dp-decimal log quantization, exact decimal dot product,
    * and tie-break order.
    */
  def topByImportanceSql(table: String, idCol: String, textCol: String,
      sourceCol: String, targetSource: String, buckets: Int = 512,
      topK: Int = 100): String = {
    def sd6(e: String) = s"CAST(round($e, 6) AS DECIMAL(18,6))"
    s"""WITH toks AS (
       |  SELECT $idCol AS doc_id, $sourceCol AS source,
       |         unnest(${TextFns.tokensSql(textCol)}) AS term
       |  FROM $table),
       |feats AS (
       |  SELECT doc_id, source,
       |         (${TextFns.md5Hash32Sql("term")}) % $buckets AS bucket,
       |         COUNT(*) AS cnt
       |  FROM toks GROUP BY 1, 2, 3),
       |by_bucket AS (
       |  SELECT bucket, SUM(cnt) AS rc,
       |         SUM(CASE WHEN source = '$targetSource' THEN cnt ELSE 0 END) AS tc
       |  FROM feats GROUP BY 1),
       |totals AS (
       |  SELECT SUM(rc) AS rtot, SUM(tc) AS ttot FROM by_bucket),
       |weights AS (
       |  SELECT bucket,
       |         ${sd6("ln(CAST(tc + 1 AS DOUBLE) / CAST(ttot + " +
                  s"$buckets AS DOUBLE))")} -
       |         ${sd6("ln(CAST(rc + 1 AS DOUBLE) / CAST(rtot + " +
                  s"$buckets AS DOUBLE))")} AS w
       |  FROM by_bucket CROSS JOIN totals)
       |SELECT f.doc_id, f.source,
       |       round(CAST(SUM(f.cnt * w.w) AS DOUBLE), 6) AS dsir_score
       |FROM feats f JOIN weights w USING (bucket)
       |GROUP BY 1, 2
       |ORDER BY dsir_score DESC, f.doc_id ASC
       |LIMIT $topK""".stripMargin
  }

  /** The batch-trained per-bucket weight table (bucket, w) — the artifact
    * the serving path ships. At most `buckets` rows regardless of corpus
    * size, so it always fits the driver / a broadcast.
    */
  def trainWeights(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, targetSource: String, buckets: Int = 512): DataFrame = {
    require(buckets > 0, s"buckets ($buckets) must be positive")
    weights(feats(docs, idCol, textCol, sourceCol, buckets), targetSource, buckets)
  }

  /** [[trainWeights]] pulled to the driver — a bounded collect (≤ buckets
    * rows), the same contract as KMeans centroids / AnnIndex constants.
    */
  def collectWeights(w: DataFrame): Map[Long, java.math.BigDecimal] =
    w.select(col("bucket").cast("long"), col("w").cast("decimal(19,6)"))
      .collect().map(r => r.getLong(0) -> r.getDecimal(1)).toMap

  /** Serve-side scoring with NO shuffle and NO aggregation state: each
    * document's tokens fold against a compiled-in weight map (per-token
    * lookup + exact decimal add — associative and commutative, so the sum
    * equals the batch `sum(cnt·w)` bit for bit). Because the plan is pure
    * per-row expressions, it runs identically on BATCH and STREAMING
    * frames (append-mode safe, no watermark needed) — train offline on
    * the corpus, score the firehose online, same number either way.
    * Features unseen at train time score 0 (OOV-neutral contract).
    */
  def serveScores(docs: DataFrame, idCol: String, textCol: String,
      w: Map[Long, java.math.BigDecimal], buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets ($buckets) must be positive")
    require(w.nonEmpty, "weight map is empty — train before serving")
    val zero = lit(java.math.BigDecimal.ZERO).cast("decimal(19,6)")
    val wmap = map(w.toSeq.sortBy(_._1).flatMap { case (k, v) =>
      Seq(lit(k), lit(v).cast("decimal(19,6)")) }: _*)
    docs.withColumn("dsir_score",
      round(aggregate(
        TextFns.tokens(col(textCol)),
        lit(java.math.BigDecimal.ZERO).cast("decimal(38,6)"),
        (acc, t) => acc + coalesce(
          element_at(wmap, pmod(TextFns.md5Hash32(t), lit(buckets.toLong))),
          zero)
      ).cast("double"), 6))
      .select(col(idCol).as("doc_id"), col("dsir_score"))
  }

  /** Gumbel-top-k importance RESAMPLE — the faithful DSIR selection rule:
    * draw `topK` documents without replacement with probability ∝ exp(score)
    * (Efraimidis–Spirakis / Gumbel-max), with the Gumbel noise derived
    * DETERMINISTICALLY from the document id's portable hash so both engines
    * draw the same sample: u = (h+0.5)/2^32 ∈ (0,1) — strictly interior, so
    * the Gumbel transform is finite — g = −ln(−ln u), and the
    * perturbed key is the exact 6dp-decimal sum d6(score) + d6(g). Same
    * single corpus pass and broadcast-weight scoring as the deterministic
    * variant; the perturbation is one scalar expression per doc.
    */
  def gumbelResample(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, targetSource: String, buckets: Int = 512,
      topK: Int = 100): DataFrame = {
    require(buckets > 0, s"buckets ($buckets) must be positive")
    require(topK > 0, s"topK ($topK) must be positive")
    val f = feats(docs, idCol, textCol, sourceCol, buckets)
    val scored = f
      .join(broadcast(weights(f, targetSource, buckets)), Seq("bucket"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("cnt") * col("w")).as("sw"))
    val u = (TextFns.md5Hash32(col("doc_id").cast("string"))
      .cast("double") + 0.5) / lit(4294967296.0)
    scored
      .withColumn("gkey", d6(col("sw").cast("double")) + d6(-log(-log(u))))
      .select(col("doc_id"), col("source"),
        round(col("sw").cast("double"), 6).as("dsir_score"),
        round(col("gkey").cast("double"), 6).as("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** [[gumbelResample]] oracle: same hash-derived uniform, Gumbel transform,
    * 6dp quantization, and tie-break.
    */
  def gumbelResampleSql(table: String, idCol: String, textCol: String,
      sourceCol: String, targetSource: String, buckets: Int = 512,
      topK: Int = 100): String = {
    def sd6(e: String) = s"CAST(round($e, 6) AS DECIMAL(18,6))"
    val uExpr = s"((CAST(${TextFns.md5Hash32Sql(s"CAST(doc_id AS VARCHAR)")} " +
      "AS DOUBLE) + 0.5) / 4294967296.0)"
    s"""WITH toks AS (
       |  SELECT $idCol AS doc_id, $sourceCol AS source,
       |         unnest(${TextFns.tokensSql(textCol)}) AS term
       |  FROM $table),
       |feats AS (
       |  SELECT doc_id, source,
       |         (${TextFns.md5Hash32Sql("term")}) % $buckets AS bucket,
       |         COUNT(*) AS cnt
       |  FROM toks GROUP BY 1, 2, 3),
       |by_bucket AS (
       |  SELECT bucket, SUM(cnt) AS rc,
       |         SUM(CASE WHEN source = '$targetSource' THEN cnt ELSE 0 END) AS tc
       |  FROM feats GROUP BY 1),
       |totals AS (
       |  SELECT SUM(rc) AS rtot, SUM(tc) AS ttot FROM by_bucket),
       |weights AS (
       |  SELECT bucket,
       |         ${sd6("ln(CAST(tc + 1 AS DOUBLE) / CAST(ttot + " +
                  s"$buckets AS DOUBLE))")} -
       |         ${sd6("ln(CAST(rc + 1 AS DOUBLE) / CAST(rtot + " +
                  s"$buckets AS DOUBLE))")} AS w
       |  FROM by_bucket CROSS JOIN totals),
       |scored AS (
       |  SELECT f.doc_id, f.source, SUM(f.cnt * w.w) AS sw
       |  FROM feats f JOIN weights w USING (bucket)
       |  GROUP BY 1, 2),
       |keyed AS (
       |  SELECT doc_id, source, sw,
       |         ${sd6("CAST(sw AS DOUBLE)")} +
       |         ${sd6(s"-ln(-ln($uExpr))")} AS gkey
       |  FROM scored)
       |SELECT doc_id, source,
       |       round(CAST(sw AS DOUBLE), 6) AS dsir_score,
       |       round(CAST(gkey AS DOUBLE), 6) AS gumbel_key
       |FROM keyed
       |ORDER BY gumbel_key DESC, doc_id ASC
       |LIMIT $topK""".stripMargin
  }
}
