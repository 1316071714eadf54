package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge/upsert for the normalized layer without a table format: latest-wins
  * by key over a union (the MERGE INTO analog when the sink is plain
  * parquet; pairs with dynamic partition overwrite for the write-back).
  *
  * Scale notes: one shuffle on the merge keys (the window), no join — at
  * 100 TB this is the same exchange a MERGE shuffle would pay; restrict
  * `base` to the partitions the updates touch (partition pruning) before
  * calling to avoid rewriting cold data.
  */
object Upsert {

  /** Keep one row per key: highest `versionCol` wins; at equal version the
    * update side beats base (deterministic).
    */
  def latestWins(base: DataFrame, updates: DataFrame,
      keys: Seq[String], versionCol: String): DataFrame = {
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_src", "_rn")
  }
}
