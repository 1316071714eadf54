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
  /** Round 12: the spread-underpartitioned-scans guard moved OUT of here
    * into [[graft.util.Spread]], applied by the few operators whose
    * stage-1 per-row work is genuinely expensive (Dedup's shingling,
    * CountMin's md5 family). Baked into every table read it cost a
    * round-robin exchange — plus sortBeforeRepartition's full local sort
    * of the table in the ONE source task — on every uncached scan of
    * every query, measured at 0.9–1.7 s per query at sf0.1 for queries
    * whose stage-1 is a cheap projection (the majority). At scale both
    * forms are no-ops (the guard is false on any properly split source);
    * locally only the compute-bound operators keep it, so their scale
    * curves still exercise parallel stage-1 math.
    */
  def table(name: String): DataFrame = {
    // Session-scoped source catalog: every `spark.read.parquet` call pays
    // driver-side file listing + a footer read for schema inference — per
    // CALL, though the answer is a pure function of (session, dir, name) and the
    // scale-factor directories are immutable for a session's lifetime.
    // Across a 226-query bench sweep that is thousands of redundant
    // listings (guide §7.3: driver work is wall-clock too). The resolved
    // plan is registered once as a TEMP VIEW — Spark's own session
    // catalog, exactly what a metastore does for a real table — and
    // re-served from there. This memoizes the ANALYZED PLAN only: every
    // action still scans the parquet files; no data or results are cached
    // (the bench's clearCache() hygiene is untouched — views survive it,
    // blocks do not).
    val view = "graft_src_" + (s"$dir/$name").map(c =>
      if (c.isLetterOrDigit) c else '_')
    if (!spark.catalog.tableExists(view)) {
      spark.read.parquet(s"$dir/$name.parquet").createOrReplaceTempView(view)
    }
    spark.table(view)
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
