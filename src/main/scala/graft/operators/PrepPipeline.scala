package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** The whole training-data prep chain composed END TO END — quality gate →
  * MinHash-LSH near-dup removal → benchmark decontamination → deterministic
  * split — reported as a per-stage yield funnel (stage, n): what a data
  * engineer reads before promoting a corpus snapshot.
  *
  * The key design choice: every document gets ONE terminal label
  * (dropped_gate / dropped_dup / dropped_contaminated / kept_<split>)
  * computed in a single DAG — the stage counts fall out of one groupBy.
  * The naive form (count() after each stage) recomputes the whole upstream
  * chain once per stage; at 100 TB that multiplies the dedup cost by the
  * number of stages. Labeling is also strictly more informative: the same
  * frame, pre-aggregation, IS the per-doc audit trail.
  *
  * Per-doc contamination is independent of the other corpus docs (it
  * compares each doc's shingles against the eval set), so it is computed
  * alongside dedup and applied only to docs that survive the earlier
  * stages — same labels, no sequencing barrier between the two heavy
  * stages (Catalyst schedules both off the shared gated scan).
  */
object PrepPipeline {

  /** Funnel over `docs(idCol, textCol)`: eval slice = `idCol < evalBelow`
    * (the held-out benchmark docs), corpus = the rest. Gate: >= minTokens
    * tokens. Near-dups at `threshold` via (n, numHashes, rowsPerBand)
    * MinHash-LSH. Contamination: >= contamFrac shingle overlap with the
    * eval slice. Split: trainFrac/validFrac by id hash.
    */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
      evalBelow: Long, minTokens: Int, n: Int, numHashes: Int,
      rowsPerBand: Int, threshold: Double, contamFrac: Double,
      trainFrac: Double, validFrac: Double): DataFrame = {
    val evalDocs = docs.filter(col(idCol) < evalBelow)
    val corpus = docs.filter(col(idCol) >= evalBelow)
      .select(col(idCol), col(textCol),
        size(TextFns.tokens(col(textCol))).cast("long").as("n_tok"))
    val pass = corpus.filter(col("n_tok") >= minTokens)
      .select(col(idCol), col(textCol))
    val dupIds = Dedup
      .minhashLshPairs(pass, idCol, textCol, n, numHashes, rowsPerBand, threshold)
      .select(col("id_b").as(idCol)).distinct()
      .withColumn("is_dup", lit(true))
    val contam = Decontaminate
      .overlapFlags(pass, evalDocs, idCol, textCol, n, contamFrac)
      .select(col("id").as(idCol), col("contaminated"))
    Sampling.split(corpus, idCol, trainFrac, validFrac)
      .join(dupIds, Seq(idCol), "left")
      .join(contam, Seq(idCol), "left")
      .select(
        when(col("n_tok") < minTokens, "10_dropped_gate")
          .when(col("is_dup"), "20_dropped_dup")
          .when(col("contaminated"), "30_dropped_contaminated")
          .otherwise(concat(lit("40_kept_"), col("split"))).as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n"))
  }

  /** DuckDB mirror of [[funnel]], composed from the stage builders'
    * fragments over the same CTE chain.
    */
  def funnelSql(table: String, idCol: String, textCol: String,
      evalBelow: Long, minTokens: Int, n: Int, numHashes: Int,
      rowsPerBand: Int, threshold: Double, contamFrac: Double,
      trainFrac: Double, validFrac: Double): String = {
    val toks = TextFns.tokensSql(textCol)
    s"""WITH corpus AS (
       |  SELECT $idCol, $textCol, CAST(len($toks) AS BIGINT) AS n_tok
       |  FROM $table WHERE $idCol >= $evalBelow),
       |pass AS (
       |  SELECT $idCol, $textCol FROM corpus WHERE n_tok >= $minTokens),
       |dups AS (
       |  SELECT DISTINCT id_b AS $idCol FROM (
       |${Dedup.minhashLshPairsSql("pass", idCol, textCol, n, numHashes, rowsPerBand, threshold)}
       |  )),
       |flags AS (
       |  SELECT id AS $idCol, contaminated FROM (
       |${Decontaminate.overlapFlagsSql(table, idCol, textCol, n, contamFrac, s"$idCol < $evalBelow")}
       |  )),
       |labeled AS (
       |  SELECT CASE
       |      WHEN c.n_tok < $minTokens THEN '10_dropped_gate'
       |      WHEN d.$idCol IS NOT NULL THEN '20_dropped_dup'
       |      WHEN f.contaminated THEN '30_dropped_contaminated'
       |      ELSE '40_kept_' || ${Sampling.splitCaseSql(s"c.$idCol", trainFrac, validFrac)}
       |    END AS stage
       |  FROM corpus c
       |  LEFT JOIN dups d ON c.$idCol = d.$idCol
       |  LEFT JOIN flags f ON c.$idCol = f.$idCol)
       |SELECT stage, COUNT(*) AS n FROM labeled GROUP BY 1""".stripMargin
  }
}
