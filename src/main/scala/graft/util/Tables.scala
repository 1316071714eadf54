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
  /** events.parquet has stored ts as TIMESTAMP(NANOS) in some driver
    * rounds (which Spark's parquet reader rejects — [PARQUET_TYPE_ILLEGAL]
    * — unless read as raw int64 nanos via the legacy conf and truncated to
    * microseconds, the same narrowing DuckDB applies) and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) in others (which Spark reads
    * as TIMESTAMP_NTZ). Handle both by inspecting the read schema; the
    * NTZ→TIMESTAMP cast is value-preserving because every session here
    * pins spark.sql.session.timeZone=UTC, matching DuckDB's naive-µs read.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
