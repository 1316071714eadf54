package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting/packing for training-data pipelines.
  *
  * All decisions derive from md5 of the row's id (engine-portable, stable
  * across runs and cluster sizes — never `rand()`): the same corpus always
  * splits the same way, and adding documents never reshuffles existing
  * assignments. Everything is a narrow projection or a single window —
  * linear at any scale.
  */
object Sampling {

  /** Uniform bucket in [0, 10000) from the first 4 md5 hex chars of the id. */
  private def hashBucket(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 10000)

  private def hashBucketSql(id: String): String =
    s"(CAST(('0x' || substring(md5(CAST($id AS VARCHAR)), 1, 4)) AS BIGINT) % 10000)"

  /** Deterministic train/validation/test split: per-mille thresholds over
    * the hash bucket (e.g. 0.8/0.1/0.1).
    */
  def split(df: DataFrame, idCol: String,
      trainFrac: Double, validFrac: Double): DataFrame =
    splitBy(df, col(idCol), trainFrac, validFrac)

  /** Split keyed by an arbitrary column: rows sharing a key always land on
    * the same side. `Dedup.clusterSafeSplit` passes the dup-cluster label
    * so near-duplicates never straddle the train/eval boundary.
    */
  def splitBy(df: DataFrame, keyCol: Column,
      trainFrac: Double, validFrac: Double): DataFrame = {
    val b = hashBucket(keyCol)
    val trainLt = (trainFrac * 10000).toInt
    val validLt = ((trainFrac + validFrac) * 10000).toInt
    df.withColumn("split",
      when(b < trainLt, "train").when(b < validLt, "valid").otherwise("test"))
  }

  def splitCaseSql(idCol: String, trainFrac: Double, validFrac: Double): String = {
    val trainLt = (trainFrac * 10000).toInt
    val validLt = ((trainFrac + validFrac) * 10000).toInt
    s"""CASE WHEN ${hashBucketSql(idCol)} < $trainLt THEN 'train'
       |     WHEN ${hashBucketSql(idCol)} < $validLt THEN 'valid'
       |     ELSE 'test' END""".stripMargin
  }

  /** Stratified cap: keep at most `cap` rows per stratum, chosen by hash
    * order (deterministic, unbiased by the input's physical order).
    */
  def stratifiedCap(df: DataFrame, stratumCol: String, idCol: String,
      cap: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Deterministic WEIGHTED sampling: keep a row iff its id-derived uniform
    * u in [0,1) falls below the row's weight (probability ∝ weight, clamped
    * to [0,1]). Hash-derived, never `rand()`: resampling the same corpus
    * keeps the same rows, and per-row inclusion is independent of
    * partitioning and cluster size. The standard knob for temperature-
    * weighting data sources in a training mix.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column): DataFrame = {
    val u = hashBucket(col(idCol)).cast("double") / 10000.0
    df.filter(u < weightCol.cast("double"))
  }

  def weightedSamplePredSql(idCol: String, weightExpr: String): String =
    s"(CAST(${hashBucketSql(idCol)} AS DOUBLE) / 10000.0) < ($weightExpr)"

  /** Source-mixture resampling: rebalance a multi-source corpus toward
    * target per-source TOKEN shares (basis points). Each document gets a
    * deterministic integer replication count approximating its source's
    * up/down-sampling factor
    *   factor_s = (target_bp · total_tokens) / (10000 · source_tokens)
    * exactly in integer arithmetic: `floor(factor)` copies always, plus one
    * extra iff the doc's hash bucket falls under the factor's fractional
    * part (bucket·den < rem·10000 — all BIGINT, exact). factor < 1 becomes
    * hash-thinned downsampling; factor > 1 epoch-style upsampling — the
    * standard mixture knob when composing a training run from web/code/
    * reference sources at fixed proportions.
    *
    * Output: one row per input doc — (id, source, n_tokens, n_copies).
    * Realized shares converge to the targets as corpora grow; they are
    * exact in expectation over the hash buckets.
    *
    * Scale notes: per-source totals are ONE tiny aggregation broadcast
    * back onto the stream (sources are few); everything else is a narrow
    * projection — no shuffle of the corpus itself. The bp·total products
    * stay under int64 up to ~10^14 corpus tokens; beyond that widen the
    * intermediate to decimal(38,0) (the comparison is the same).
    */
  def sourceMixture(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, targetsBp: Map[String, Int]): DataFrame = {
    require(targetsBp.values.sum == 10000,
      s"target shares must sum to 10000 bp, got ${targetsBp.values.sum}")
    val tok = graft.functions.TextFns.tokenCount(col(textCol))
    val docs = df.select(col(idCol).as("id"), col(srcCol).as("source"),
      tok.as("n_tokens"))
    val bySrc = docs.groupBy(col("source"))
      .agg(sum(col("n_tokens")).as("src_tokens"))
    val totals = bySrc.agg(sum(col("src_tokens")).as("total_tokens"))
    val targets = targetsBp.toSeq.map { case (s, bp) => (s, bp.toLong) }
    // A source present in the data but absent from targetsBp must fail
    // LOUDLY: a silent NULL share would drop the whole source from the
    // realized mixture (CASE branches evaluate lazily, so the error fires
    // only when an unlisted source actually appears).
    val targetCol = targets.foldLeft(
      raise_error(concat(lit("sourceMixture: source missing from targets: "),
        col("source"))).cast("long")) {
      case (els, (s, bp)) => when(col("source") === s, lit(bp)).otherwise(els)
    }
    docs
      .join(broadcast(bySrc), Seq("source"))
      .crossJoin(broadcast(totals))
      .withColumn("target_bp", targetCol)
      .withColumn("num", col("target_bp") * col("total_tokens"))
      .withColumn("den", lit(10000L) * col("src_tokens"))
      .withColumn("n_copies",
        expr("num DIV den") +
          when(hashBucket(col("id")) * col("den") <
            pmod(col("num"), col("den")) * 10000L, 1L).otherwise(0L))
      .select(col("id"), col("source"), col("n_tokens"), col("n_copies"))
  }

  /** DuckDB twin of `sourceMixture` over `table`. */
  def sourceMixtureSql(table: String, idCol: String, textCol: String,
      srcCol: String, targetsBp: Map[String, Int]): String = {
    val tok = graft.functions.TextFns.tokenCountSql(textCol)
    val targetCase = targetsBp.toSeq.sortBy(_._1)
      .map { case (s, bp) => s"WHEN d.source = '$s' THEN CAST($bp AS BIGINT)" }
      .mkString("CASE ",
        " ", " ELSE CAST(error('sourceMixture: source missing from targets: '"
          + " || d.source) AS BIGINT) END")
    s"""WITH docs AS (
       |  SELECT $idCol AS id, $srcCol AS source, $tok AS n_tokens FROM $table),
       |by_src AS (
       |  SELECT source, SUM(n_tokens) AS src_tokens FROM docs GROUP BY 1),
       |tot AS (SELECT SUM(src_tokens) AS total_tokens FROM by_src),
       |j AS (
       |  SELECT d.id, d.source, d.n_tokens,
       |    ($targetCase) * t.total_tokens AS num,
       |    10000 * b.src_tokens AS den
       |  FROM docs d JOIN by_src b ON d.source = b.source CROSS JOIN tot t)
       |SELECT id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(num // den + (CASE WHEN ${hashBucketSql("id")} * den <
       |    (num % den) * 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_copies
       |FROM j""".stripMargin
  }

  /** Token-budget packing: assign docs (ordered by id within a stratum) to
    * consecutive batches of at most `budget` tokens — batch id =
    * floor(exclusive-prefix-sum / budget). Oversized single docs get their
    * own batch.
    */
  def packByTokenBudget(df: DataFrame, stratumCol: String, idCol: String,
      tokenCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_cum", sum(col(tokenCol)).over(w))
      // explicit floor: Spark's double→long cast truncates but DuckDB's
      // rounds, so floor() in both keeps the batch ids portable
      .withColumn("batch_id",
        floor((col("_cum") - col(tokenCol)) / budget).cast("long"))
      .drop("_cum")
  }

  /** Deterministic contrastive NEGATIVE sampling — the pairing pass a
    * retrieval/embedding training set needs: for every document, `numNegs`
    * pseudo-random other documents, chosen by hashing (doc, slot) — never
    * `rand()`, so the same corpus always pairs the same way and both
    * engines replay it. Requires ids dense in [0, n) (the layout a
    * packed training corpus has); a hashed slot that lands on the doc
    * itself is dropped (standard — docs then have <= numNegs negatives).
    *
    * Shape: one scalar count broadcast + a narrow explode (numNegs rows
    * per doc), then ONE equi-join back on the sampled id to fetch the
    * negative's attributes — at 100 TB the join shuffles only (id, slot)
    * pairs against the attr projection; nothing is quadratic.
    */
  def negativePairs(docs: DataFrame, idCol: String, attrCols: Seq[String],
      numNegs: Int): DataFrame = {
    val n = docs.agg(count(lit(1)).cast("long").as("_n"))
    val cand = docs.select(col(idCol).as("doc_id"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("_n"),
        explode(array((0 until numNegs).map(j => lit(j.toLong)): _*)).as("slot"))
      .withColumn("neg_id", pmod(graft.functions.TextFns.md5Hash32(
        concat(col("doc_id").cast("string"), lit(":"), col("slot").cast("string"))),
        col("_n")))
      .filter(col("neg_id") =!= col("doc_id"))
      .select(col("doc_id"), col("slot"), col("neg_id"))
    val attrs = docs.select(col(idCol).as("neg_id") +:
      attrCols.map(c => col(c).as(s"neg_$c")): _*)
    cand.join(attrs, Seq("neg_id"))
      .select(col("doc_id") +: col("slot") +: col("neg_id") +:
        attrCols.map(c => col(s"neg_$c")): _*)
  }

  /** DuckDB mirror of negativePairs over `table`. */
  def negativePairsSql(table: String, idCol: String, attrCols: Seq[String],
      numNegs: Int): String = {
    val negAttrs = attrCols.map(c => s"nd.$c AS neg_$c").mkString(", ")
    s"""WITH n AS (SELECT COUNT(*) AS _n FROM $table),
       |cand AS (
       |  SELECT d.$idCol AS doc_id, s.slot,
       |    ${graft.functions.TextFns.md5Hash32Sql(
              s"CAST(d.$idCol AS VARCHAR) || ':' || CAST(s.slot AS VARCHAR)")} % _n
       |      AS neg_id
       |  FROM $table d
       |  CROSS JOIN n
       |  CROSS JOIN (SELECT unnest(range($numNegs)) AS slot) s)
       |SELECT c.doc_id, c.slot, c.neg_id, $negAttrs
       |FROM cand c JOIN $table nd ON nd.$idCol = c.neg_id
       |WHERE c.neg_id <> c.doc_id""".stripMargin
  }
}
