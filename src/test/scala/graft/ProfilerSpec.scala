package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiler

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls and distincts per column, typed extremes") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(5L), None), (None, Some("b")),
      (Some(5L), Some("a"))).toDF("num", "str")
    val p = Profiler.profile(df, Seq("num"), Seq("str"))
      .collect().map(r => r.getString(0) -> r).toMap
    val num = p("num")
    assert(num.getLong(1) == 4 && num.getLong(2) == 1) // n, n_null
    assert(num.getLong(3) == 2)                        // distinct {1,5}
    assert(num.getDouble(4) == 1.0 && num.getDouble(5) == 5.0)
    assert(num.isNullAt(6) && num.isNullAt(7))
    val str = p("str")
    assert(str.getLong(2) == 1 && str.getLong(3) == 2)
    assert(str.getString(6) == "a" && str.getString(7) == "b")
    assert(str.isNullAt(4) && str.isNullAt(5))
  }

  test("profile is a single aggregation pass (no per-column scans)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plan = Profiler.profile(df, Seq("o_orderkey"), Seq("o_orderstatus"))
      .queryExecution.executedPlan.toString
    val scans = "FileScan".r.findAllIn(plan).size
    assert(scans == 1, plan)
  }
}
