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
}
