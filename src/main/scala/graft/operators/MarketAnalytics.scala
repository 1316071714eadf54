package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's implied downstream analytics on its own normalized market
  * schema (reference README.md:4: "crop-level pricing, packaging types, daily
  * volumes sold, cumulative monthly volumes, and revenue figures";
  * top-five per form_handler.py:8-10). Input: the normalized layer produced
  * by MarketPipeline.normalize (commodity, scrape_date, total_value_sold,
  * total_quantity_sold, ...).
  *
  * All are partial-aggregation-friendly groupBys; the cumulative window
  * pre-aggregates to (commodity × month) first so window state is tiny at
  * any fact size.
  */
object MarketAnalytics {

  /** A5: daily volumes sold per commodity. */
  def dailyVolumes(normalized: DataFrame): DataFrame =
    normalized
      .groupBy(col("commodity"), col("scrape_date"))
      .agg(
        sum(col("total_quantity_sold")).as("qty_sold"),
        sum(col("total_value_sold")).as("value_sold"))

  /** A6: cumulative monthly volumes per commodity (running sum over days
    * within each month).
    */
  def cumulativeMonthlyVolumes(normalized: DataFrame): DataFrame = {
    val daily = dailyVolumes(normalized)
      .withColumn("month", date_trunc("month", col("scrape_date")))
    val w = Window.partitionBy(col("commodity"), col("month"))
      .orderBy(col("scrape_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("cum_qty_month", sum(col("qty_sold")).over(w))
  }

  /** A7: revenue per commodity over a date range. */
  def revenue(normalized: DataFrame): DataFrame =
    normalized
      .groupBy(col("commodity"))
      .agg(sum(col("total_value_sold")).as("revenue"))

  /** A8: the top-five commodities by revenue (the reference's stubbed
    * `top_five`), deterministic tie-break on name.
    */
  def topFiveCommodities(normalized: DataFrame): DataFrame =
    revenue(normalized)
      .orderBy(col("revenue").desc, col("commodity").asc)
      .limit(5)
}
