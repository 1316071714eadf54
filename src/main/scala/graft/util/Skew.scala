package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md scale notes): salting for hot keys.
  *
  * At 100 TB a groupBy on a power-law key (e.g. commodity, user_id) puts one
  * key's entire volume on one reducer. Salted two-phase aggregation splits
  * each key across `salts` partial groups (map-side spread), aggregates
  * partials, then merges — turning one hot reducer into `salts` even ones.
  * AQE's skew-join handling covers joins; this covers aggregations whose
  * partial state is reassociable (sums/counts/min/max).
  */
object Skew {

  /** Deterministic salt in [0, salts) derived from stable row content.
    * Use a high-cardinality column (an id) so spreading is even.
    */
  def salt(c: Column, salts: Int): Column = pmod(hash(c), lit(salts))

  /** Two-phase salted sum/count per key:
    * phase 1 groups on (key, salt) — shuffle is spread across salts;
    * phase 2 merges the `salts` partials per key — tiny.
    */
  def saltedSumCount(df: DataFrame, key: Column, saltBy: Column,
      valueCol: Column, salts: Int): DataFrame =
    df.groupBy(key.as("key"), salt(saltBy, salts).as("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pn"))
      .groupBy(col("key"))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pn")).cast("long").as("n"))

  /** Key-distribution profile — the "should I salt / broadcast / AQE-skew
    * this?" advisor. One row: total rows, distinct keys, max / mean / p50 /
    * p99 group size, the hottest key (largest group, key-desc tiebreak) and
    * its exact share of all rows.
    *
    * Scale notes: the group-size relation is the output of ONE hash
    * aggregation (map-side combined), |keys| rows — everything after runs on
    * that reduced relation, never the raw table. The exact `percentile` over
    * it buffers |keys| longs in a single agg buffer, fine up to tens of
    * millions of keys; past that swap `approx_percentile` in (same call
    * shape) — the advisor's decisions don't need exact tail quantiles. The
    * hottest key is an `orderBy(...).limit(1)` top-1 (partial top-k per
    * partition, no global sort materialization).
    */
  def keyStats(df: DataFrame, key: Column): DataFrame = {
    val sizes = df.groupBy(key.as("k")).agg(count(lit(1)).as("g"))
    val top = sizes.orderBy(col("g").desc, col("k").desc).limit(1)
      .select(col("k").cast("string").as("top_key"), col("g").as("top_group"))
    sizes
      .agg(
        sum(col("g")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("g")).as("max_group"),
        expr("percentile(g, 0.5)").as("p50_group"),
        expr("percentile(g, 0.99)").as("p99_group"))
      .join(broadcast(top))
      .select(col("n_rows"), col("n_keys"), col("max_group"),
        (col("n_rows").cast("double") / col("n_keys")).as("avg_group"),
        col("p50_group"), col("p99_group"),
        col("top_key"),
        (col("top_group").cast("double") / col("n_rows")).as("top_share"))
  }

  /** DuckDB mirror of `keyStats` over table `rel`, key expression `keyExpr`. */
  def keyStatsSql(rel: String, keyExpr: String): String =
    s"""WITH sizes AS (
       |  SELECT $keyExpr AS k, COUNT(*) AS g FROM $rel GROUP BY 1),
       |top AS (
       |  SELECT CAST(k AS VARCHAR) AS top_key, g AS top_group
       |  FROM sizes ORDER BY g DESC, k DESC LIMIT 1),
       |stats AS (
       |  SELECT CAST(SUM(g) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
       |    MAX(g) AS max_group,
       |    quantile_cont(g, 0.5) AS p50_group,
       |    quantile_cont(g, 0.99) AS p99_group
       |  FROM sizes)
       |SELECT n_rows, n_keys, max_group,
       |  CAST(n_rows AS DOUBLE) / n_keys AS avg_group,
       |  p50_group, p99_group, top_key,
       |  CAST(top_group AS DOUBLE) / n_rows AS top_share
       |FROM stats CROSS JOIN top""".stripMargin
}
