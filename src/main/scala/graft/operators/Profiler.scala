package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level data profiling — the ANALYZE-TABLE shape every ingestion
  * pipeline runs before trusting a new drop: per-column row/null/distinct
  * counts plus min/max (numeric columns as exact doubles, string columns
  * as strings — kept in separate output columns so no engine-dependent
  * number formatting enters the hash).
  *
  * Scale: ONE pass — a single global aggregation computes every column's
  * stats together (count/min/max partial-aggregate map-side), then the
  * 1-row result explodes into one row per column. No per-column scans.
  * Distinct counts: exact `count(DISTINCT)` Expands the input once per
  * profiled column before the shuffle — correct, and the oracle anchor
  * (p01), but c columns × n rows of Expand output is the wrong trade at
  * 100 TB. `approx = true` swaps in `approx_count_distinct` (HLL++):
  * constant-size sketches, NO Expand, genuinely one map-side-combined
  * aggregation — the ANALYZE mode for a real drop, spec-checked against
  * the exact twin within HLL tolerance (like q24's estimator).
  */
object Profiler {

  /** numericCols/stringCols: columns to profile, by type. Output:
    * (column, n, n_null, n_distinct, min_num, max_num, min_str, max_str).
    */
  def profile(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String], approx: Boolean = false): DataFrame = {
    def nd(c: String) =
      if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))
    val aggs = (numericCols ++ stringCols).flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        nd(c).as(s"_nd_$c"),
        min(col(c)).as(s"_min_$c"),
        max(col(c)).as(s"_max_$c"))
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val rows = numericCols.map { c =>
      struct(lit(c).as("column"), col("_n").as("n"),
        (col("_n") - col(s"_cnt_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").cast("double").as("min_num"),
        col(s"_max_$c").cast("double").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    } ++ stringCols.map { c =>
      struct(lit(c).as("column"), col("_n").as("n"),
        (col("_n") - col(s"_cnt_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"_min_$c").cast("string").as("min_str"),
        col(s"_max_$c").cast("string").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  def profileSql(table: String, numericCols: Seq[String],
      stringCols: Seq[String]): String = {
    val selects = numericCols.map { c =>
      s"""SELECT '$c' AS "column", COUNT(*) AS n,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM $table""".stripMargin
    } ++ stringCols.map { c =>
      s"""SELECT '$c' AS "column", COUNT(*) AS n,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  CAST(MIN($c) AS VARCHAR) AS min_str, CAST(MAX($c) AS VARCHAR) AS max_str
         |FROM $table""".stripMargin
    }
    selects.mkString("\nUNION ALL\n")
  }
}
