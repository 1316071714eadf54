package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Benchmark decontamination — the training-data hygiene pass that flags
  * training documents overlapping an evaluation/benchmark corpus by shared
  * word n-grams (the standard contamination test applied before training).
  *
  * Scale shape: the eval corpus is tiny next to a training corpus (MBs vs
  * TBs), so its distinct shingle set BROADCASTS; the training side is one
  * narrow shingle pass + a semi-join + one aggregation — the 100 TB corpus
  * is read once and never shuffled beyond the per-doc counts.
  */
object Decontaminate {

  /** Per-training-doc overlap against the eval corpus' distinct shingles.
    * Output: (id, n_sh, n_overlap, overlap_frac, contaminated) — one row
    * per training doc with at least one shingle; `contaminated` iff
    * overlap_frac >= frac.
    */
  def overlapFlags(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int, frac: Double): DataFrame = {
    val trainSh = train.select(col(idCol).as("id"),
        explode(array_distinct(TextFns.shingles(col(textCol), n))).as("sh"))
    val evalSh = eval
      .select(explode(TextFns.shingles(col(textCol), n)).as("sh")).distinct()
    val overlaps = trainSh.join(broadcast(evalSh), Seq("sh"), "left_semi")
      .groupBy(col("id")).agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol).as("id"),
        size(array_distinct(TextFns.shingles(col(textCol), n))).cast("long").as("n_sh"))
      .filter(col("n_sh") > 0)
      .join(overlaps, Seq("id"), "left")
      .select(col("id"), col("n_sh"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("overlap_frac",
        col("n_overlap").cast("double") / col("n_sh").cast("double"))
      .withColumn("contaminated", col("overlap_frac") >= frac)
  }

  /** DuckDB twin over one table split by a predicate into train vs eval. */
  def overlapFlagsSql(table: String, idCol: String, textCol: String,
      n: Int, frac: Double, evalPred: String): String =
    s"""WITH train_sh AS (
       |  SELECT DISTINCT $idCol AS id, unnest(${TextFns.shinglesSql(textCol, n)}) AS sh
       |  FROM $table WHERE NOT ($evalPred)),
       |eval_sh AS (
       |  SELECT DISTINCT unnest(${TextFns.shinglesSql(textCol, n)}) AS sh
       |  FROM $table WHERE $evalPred),
       |ovl AS (
       |  SELECT id, COUNT(*) AS n_overlap FROM train_sh
       |  WHERE sh IN (SELECT sh FROM eval_sh) GROUP BY id),
       |sizes AS (
       |  SELECT $idCol AS id, len(list_distinct(${TextFns.shinglesSql(textCol, n)})) AS n_sh
       |  FROM $table WHERE NOT ($evalPred))
       |SELECT s.id, CAST(s.n_sh AS BIGINT) AS n_sh,
       |  CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       |  CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / CAST(s.n_sh AS DOUBLE) AS overlap_frac,
       |  CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / CAST(s.n_sh AS DOUBLE) >= $frac AS contaminated
       |FROM sizes s LEFT JOIN ovl o ON s.id = o.id
       |WHERE s.n_sh > 0""".stripMargin
}
