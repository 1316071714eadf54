package graft

import org.apache.spark.sql.functions._

import graft.operators.{GapFill, Profiler}

/** Linear-interpolation gap fill and chi-square distribution drift. */
class InterpDriftSpec extends SparkSpec {
  import spark.implicits._

  test("denseInterp blends gap days linearly, leaves edges null") {
    val daily = Seq(
      (1L, "2024-01-02", 1L, 10.0),
      (1L, "2024-01-05", 1L, 40.0), // gap 03 -> 20.0, 04 -> 30.0
      (1L, "2024-01-06", 1L, 0.0))
      .toDF("k", "day", "n", "v")
      .withColumn("day", col("day").cast("date"))
    val out = GapFill.denseInterp(daily, "k", "day", "n", "v")
      .orderBy("day").collect()
    val interp = out.map(r => Option(r.getAs[java.lang.Double]("interp_v")))
    assert(interp.toSeq == Seq(Some(10.0), Some(20.0), Some(30.0),
      Some(40.0), Some(0.0)))
    // span is global: a second key starting later gets leading-edge nulls
    val daily2 = daily.unionByName(Seq((2L, "2024-01-04", 1L, 7.0))
      .toDF("k", "day", "n", "v").withColumn("day", col("day").cast("date")))
    val k2 = GapFill.denseInterp(daily2, "k", "day", "n", "v")
      .filter(col("k") === 2L).orderBy("day").collect()
    assert(k2.length == 5)
    assert(Option(k2(0).getAs[java.lang.Double]("interp_v")).isEmpty)
    assert(k2(2).getAs[Double]("interp_v") == 7.0)
    assert(Option(k2(4).getAs[java.lang.Double]("interp_v")).isEmpty)
  }

  test("distDrift: identical distributions give near-zero chi2 terms") {
    val ref = (1L to 1000L).map(i => (i % 100) * 1.0).toDF("v")
    val out = Profiler.distDrift(ref, ref, "v").collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Double]("chi2_term") == 0.0))
    assert(out.map(_.getAs[Long]("ref_n")).sum == 1000L)
  }

  test("distDrift: shifted distribution concentrates mass in edge bucket") {
    val ref = (1L to 1000L).map(i => (i % 100) * 1.0).toDF("v")
    val cur = (1L to 1000L).map(i => 1000.0 + i).toDF("v") // all above ref max
    val out = Profiler.distDrift(ref, cur, "v")
      .orderBy("bucket").collect()
    assert(out(9).getAs[Long]("cur_n") == 1000L) // clamped into top bucket
    assert(out.map(_.getAs[Double]("chi2_term")).sum > 1.0)
  }
}
