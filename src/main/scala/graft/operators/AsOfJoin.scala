package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the payload of the latest
  * right row with the same key and right.time <= left.time.
  *
  * Spark has no built-in as-of join, so this composes one from a union and a
  * running `last(ignoreNulls)` window (SURVEY.md §2.3): tag both sides, sort
  * within each key by (time, side, tiebreak) with right rows ordered before
  * left rows at equal timestamps (<= semantics) and later tiebreaks last,
  * then carry the most recent non-null payload forward onto each left row.
  *
  * Scale notes: exactly ONE shuffle (the window's hash partitioning on the
  * key) regardless of side sizes — same exchange count as a sort-merge join,
  * but with no per-key quadratic blowup: each row is touched once in sorted
  * order. Skewed keys behave like any skewed window (salt by time-range if a
  * single key's history exceeds an executor).
  */
object AsOfJoin {

  /** @param payloadCols right columns to attach (null when no match)
    * @param rightTiebreak right column ordering matches at equal time —
    *        the greatest wins, making results deterministic.
    */
  def backward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payloadCols: Seq[String], rightTiebreak: String): DataFrame = {
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(0).as("_side"), col(rightTiebreak).cast("long").as("_tb"),
      struct(payloadCols.map(col): _*).as("_payload"))
      // A NULL right time compares NULL to every left time → never a match;
      // unfiltered it would sort nulls-first and leak into every window.
      .where(col("_t").isNotNull)
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1)).withColumn("_tb", lit(0L))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_match",
      last(col("_payload"), ignoreNulls = true).over(w))
    // A NULL left time likewise matches nothing (right.time <= NULL is NULL).
    val outCols = left.columns.map(col) ++
      payloadCols.map(p =>
        when(col("_t").isNotNull, col("_match").getField(p)).as(p))
    carried.filter(col("_side") === 1).select(outCols.toIndexedSeq: _*)
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row with the
    * same key and right.time >= left.time (the "next event after" lookup:
    * next quote after a trade, next order after a page view). Same
    * one-shuffle union+window shape as [[backward]], mirrored: left rows
    * sort BEFORE right rows at equal timestamps (>= includes ties) and the
    * window looks forward, taking the FIRST non-null payload in
    * [current, unbounded following]. Smallest tiebreak wins at equal right
    * times (the earliest-deterministic choice), so `_tb` orders ascending.
    */
  def forward(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payloadCols: Seq[String], rightTiebreak: String): DataFrame = {
    val r = right.select(
      col(rightKey).as("_k"), col(rightTime).as("_t"),
      lit(1).as("_side"), col(rightTiebreak).cast("long").as("_tb"),
      struct(payloadCols.map(col): _*).as("_payload"))
      .where(col("_t").isNotNull) // NULL right time never matches (see backward)
    val l = left
      .withColumn("_k", col(leftKey)).withColumn("_t", col(leftTime))
      .withColumn("_side", lit(0)).withColumn("_tb", lit(0L))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc, col("_tb").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = unioned.withColumn("_match",
      first(col("_payload"), ignoreNulls = true).over(w))
    // A NULL left time sorts nulls-first and would otherwise "see" the whole
    // key history ahead of it; right.time >= NULL is NULL → no match.
    val outCols = left.columns.map(col) ++
      payloadCols.map(p =>
        when(col("_t").isNotNull, col("_match").getField(p)).as(p))
    carried.filter(col("_side") === 0).select(outCols.toIndexedSeq: _*)
  }
}
