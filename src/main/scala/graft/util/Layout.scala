package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout helpers (SURVEY.md §4 "physical layout decisions"):
  * bucketing for co-located joins and aggregations.
  *
  * At 100 TB, a fact⋈fact join on the same key repeated across a pipeline
  * should not pay a shuffle each time. Writing both sides bucketed by the
  * join key (hive-style bucketed tables) lets Spark plan a SortMergeJoin
  * with NO Exchange on either side — the bucketing metadata proves the
  * co-partitioning. The same applies to groupBy on the bucket key.
  */
object Layout {

  /** Write `df` as a bucketed managed table (bucketBy requires saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
