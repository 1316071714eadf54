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
}
