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
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

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
