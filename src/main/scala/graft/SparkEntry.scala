package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a named
  * query; `oracleSql` carries the DuckDB-equivalent statement the driver
  * hash-compares against at sf0.01.
  */
object SparkEntry {

  /** All declared queries, grouped by module. */
  def allQueries: Seq[Q] =
    StarQueries.all ++ SqlQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      EventQueries.all ++ EmbeddingQueries.all ++ MarketQueries.all ++
      MultimodalQueries.all ++ MiscQueries.all ++ LayoutQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's implied headline analytic: top-5 by revenue
    * (reference README.md:4, scraper/form_handler.py:8-10).
    */
  def entry(spark: SparkSession): DataFrame =
    allQueries.find(_.name == "q02_top5_brand_revenue").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
