package graft

import org.apache.spark.sql.functions._

import graft.operators.MarketAnalytics

/** Golden checks for the reference's implied analytics (README.md:4) on a
  * hand-computed normalized market frame.
  */
class MarketAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // (commodity, scrape_date, qty, value) — apples span two days in one
  // month + one day in the next; pears one day.
  val normalized = Seq(
    ("apples", "2026-08-01", 10L, 100.0),
    ("apples", "2026-08-01", 5L, 50.0), // second container same day
    ("apples", "2026-08-02", 20L, 200.0),
    ("apples", "2026-09-01", 7L, 70.0),
    ("pears", "2026-08-01", 3L, 300.0),
  ).toDF("commodity", "scrape_date", "total_quantity_sold", "total_value_sold")
    .withColumn("scrape_date", to_date(col("scrape_date")))

  test("dailyVolumes sums per (commodity, day) — A5") {
    val d = MarketAnalytics.dailyVolumes(normalized)
      .filter(col("commodity") === "apples" && col("scrape_date") === "2026-08-01")
      .head()
    assert(d.getAs[Long]("qty_sold") == 15L && d.getAs[Double]("value_sold") == 150.0)
  }

  test("cumulativeMonthlyVolumes resets per month — A6") {
    val c = MarketAnalytics.cumulativeMonthlyVolumes(normalized)
      .filter(col("commodity") === "apples")
      .orderBy("scrape_date")
      .select("cum_qty_month").collect().map(_.getLong(0)).toSeq
    assert(c == Seq(15L, 35L, 7L)) // aug1=15, aug2=15+20, sep1 resets to 7
  }

  test("topFiveCommodities ranks by revenue — A7/A8") {
    val top = MarketAnalytics.topFiveCommodities(normalized).collect()
    assert(top.map(_.getString(0)).toSeq == Seq("apples", "pears"))
    assert(top.head.getAs[Double]("revenue") == 420.0)
  }
}
