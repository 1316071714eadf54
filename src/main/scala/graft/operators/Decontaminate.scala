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

  /** Contamination PROVENANCE: for every training doc sharing at least
    * `minShared` distinct `n`-gram shingles with the eval corpus, the eval
    * document it most overlaps (max shared count, min eval id on ties) —
    * the "which benchmark leaked into this page" answer an audit needs
    * after t13's boolean flag. Output: (id, best_eval_id, n_shared).
    *
    * Scale shape: same as `overlapFlags` — the eval shingle→doc relation
    * broadcasts (eval corpora are MBs), the training side is one narrow
    * shingle pass; the (train, eval) pair counts shuffle on the train id
    * and the argmax is a declarative max_by, no window.
    */
  def provenance(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int, minShared: Long): DataFrame = {
    val trainSh = train.select(col(idCol).as("id"),
      explode(array_distinct(TextFns.shingles(col(textCol), n))).as("sh"))
    val evalSh = eval.select(col(idCol).as("eval_id"),
      explode(array_distinct(TextFns.shingles(col(textCol), n))).as("sh"))
    trainSh.join(broadcast(evalSh), Seq("sh"))
      .groupBy(col("id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .groupBy(col("id"))
      // composite argmax as a lexicographic struct max (max n_shared, min
      // eval_id on ties) — both engines order structs field-by-field, and
      // unlike an arithmetic packing there is no id-range assumption to
      // silently overflow
      .agg(max(struct(col("n_shared").as("ns"),
        (-col("eval_id")).as("e"))).as("m"))
      .select(col("id"), (-col("m.e")).as("best_eval_id"),
        col("m.ns").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** DuckDB twin of `provenance` (same split-by-predicate convention). */
  def provenanceSql(table: String, idCol: String, textCol: String,
      n: Int, minShared: Long, evalPred: String): String =
    s"""WITH train_sh AS (
       |  SELECT DISTINCT $idCol AS id, unnest(${TextFns.shinglesSql(textCol, n)}) AS sh
       |  FROM $table WHERE NOT ($evalPred)),
       |eval_sh AS (
       |  SELECT DISTINCT $idCol AS eval_id, unnest(${TextFns.shinglesSql(textCol, n)}) AS sh
       |  FROM $table WHERE $evalPred),
       |pairs AS (
       |  SELECT t.id, e.eval_id, COUNT(*) AS n_shared
       |  FROM train_sh t JOIN eval_sh e ON t.sh = e.sh
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT id, -(m.e) AS best_eval_id, m.ns AS n_shared FROM (
       |    SELECT id, max({'ns': n_shared, 'e': -eval_id}) AS m
       |    FROM pairs GROUP BY 1))
       |SELECT id, best_eval_id, CAST(n_shared AS BIGINT) AS n_shared
       |FROM best WHERE n_shared >= $minShared""".stripMargin

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
