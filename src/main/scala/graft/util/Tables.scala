package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All engine queries take a scale-factor directory and read parquet through
  * here so that scans stay columnar/vectorized and Catalyst can push filters
  * and prune columns at the source. At cluster scale the same API would point
  * at a partitioned data-lake root instead of a flat directory.
  */
final case class Tables(spark: SparkSession, dir: String) {
  /** On a real cluster a table scan arrives split across many files/row
    * groups and every core works stage 1; the local testdata is one
    * single-row-group file per table, so the scan is ONE task and all
    * pre-shuffle work (regex scoring, shingling, join-probe levenshtein,
    * dot products) serializes on one core. Spread underpartitioned scans to
    * defaultParallelism — a few-MB local shuffle — so local stage-1 math
    * runs parallel like a cluster's would. No-op (guard is false) whenever
    * the source is properly split, i.e. always at scale.
    */
  def table(name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    val defaultPar = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < defaultPar) df.repartition(defaultPar) else df
  }

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")
  /** events.parquet stores ts as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read the raw int64 nanos via
    * the legacy conf and truncate to microseconds — the same truncation
    * DuckDB applies when it narrows ns to its native µs timestamps, so both
    * engines see identical values.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
