package graft

import java.sql.Date

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType),
    StructField("day", DateType),
    StructField("cents", LongType)))

  private def series(vals: Seq[(String, Int, Long)]) = {
    val rows = vals.map { case (k, d, c) =>
      Row(k, Date.valueOf(f"2024-01-$d%02d"), c)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("rollingVol matches a brute-force sample stddev and skips partial windows") {
    val vals = (1 to 10).map(d => ("a", d, (d * d * 100).toLong))
    val got = TimeSeries.rollingVol(series(vals), "k", "day", "cents", win = 4)
      .collect().map(r => (r.getDate(1).toString, r.getDouble(2))).toMap
    // days 1-3 have <4 trailing rows and must be absent
    assert(got.size == 7 && !got.contains("2024-01-03"))
    for (d <- 4 to 10) {
      val window = (d - 3 to d).map(i => (i * i * 100).toDouble)
      val mean = window.sum / 4
      val exp = math.sqrt(window.map(x => (x - mean) * (x - mean)).sum / 3) / 100.0
      val g = got(f"2024-01-$d%02d")
      assert(math.abs(g - exp) < 1e-9, s"day $d: $g vs $exp")
    }
  }

  test("rollingVol keeps keys independent") {
    val vals = (1 to 5).map(d => ("a", d, 100L)) ++ (1 to 5).map(d => ("b", d, 500L))
    val got = TimeSeries.rollingVol(series(vals), "k", "day", "cents", win = 3)
    // constant series per key → zero volatility everywhere, 3 full windows each
    assert(got.count() == 6)
    assert(got.filter(col("vol") =!= 0.0).count() == 0)
  }

  test("rollingVol rejects win < 2") {
    intercept[IllegalArgumentException] {
      TimeSeries.rollingVol(series(Seq(("a", 1, 1L))), "k", "day", "cents", win = 1)
    }
  }

  test("ewma matches the sequential recursion per key") {
    val vals = Seq(("a", 1, 400L), ("a", 2, 800L), ("a", 3, 200L), ("a", 4, 1000L),
      ("b", 1, 100L))
    val df = series(vals).withColumn("x", col("cents").cast("double"))
    val got = TimeSeries.ewma(df, "k", "day", "x", alpha = 0.25)
      .collect().map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(3))
      .toMap
    var s = 400.0
    assert(got(("a", "2024-01-01")) == s)
    for ((x, d) <- Seq(800.0 -> 2, 200.0 -> 3, 1000.0 -> 4)) {
      s = 0.25 * x + 0.75 * s
      assert(got(("a", f"2024-01-$d%02d")) == s, s"day $d")
    }
    // a single-element key is its own smoothed value
    assert(got(("b", "2024-01-01")) == 100.0)
    assert(got.size == 5)
  }

  test("ewma is deterministic under repartitioning (sorted fold, not arrival order)") {
    val vals = (1 to 20).map(d => ("a", d, (d * 37 % 11 * 100).toLong))
    val df = series(vals).withColumn("x", col("cents").cast("double"))
    val a = TimeSeries.ewma(df.repartition(7), "k", "day", "x", 0.25)
      .collect().map(r => r.getDate(1).toString -> r.getDouble(3)).sortBy(_._1)
    val b = TimeSeries.ewma(df.coalesce(1), "k", "day", "x", 0.25)
      .collect().map(r => r.getDate(1).toString -> r.getDouble(3)).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }
}
