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

  test("correlationMatrix agrees with built-in corr; one scan for all pairs") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val df = Profiler.correlationMatrix(li, cols)
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == 3)
    for (((a, b), c) <- got) {
      val ref = li.agg(corr(col(a), col(b))).head.getDouble(0)
      assert(math.abs(c - ref) < 1e-9, s"($a,$b): $c vs builtin $ref")
    }
    // fresh frame: an executed AQE plan stringifies initial+final and
    // would double-count the scan
    val plan = Profiler.correlationMatrix(li, cols)
      .queryExecution.executedPlan.toString
    assert("FileScan".r.findAllIn(plan).size == 1, plan)
  }

  test("approx profile matches exact within HLL tolerance, plan has no Expand") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cols = (Seq("o_orderkey", "o_custkey", "o_totalprice"),
      Seq("o_orderstatus", "o_orderpriority"))
    val approx = Profiler.profile(df, cols._1, cols._2, approx = true)
    // the scale property: approx_count_distinct drops the per-column Expand
    // (exact count-distinct rewrites through one) and stays a single scan
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    assert("FileScan".r.findAllIn(plan).size == 1, plan)
    // every other stat is identical to the exact twin; n_distinct within
    // the default HLL++ relative error (5%, generous margin here)
    val exact = Profiler.profile(df, cols._1, cols._2)
      .collect().map(r => r.getString(0) -> r).toMap
    for (r <- approx.collect()) {
      val e = exact(r.getString(0))
      assert(r.getLong(1) == e.getLong(1) && r.getLong(2) == e.getLong(2))
      assert(math.abs(r.getLong(3) - e.getLong(3)) <= math.max(2, 0.1 * e.getLong(3)),
        s"${r.getString(0)}: approx ${r.getLong(3)} vs exact ${e.getLong(3)}")
      assert(Seq(4, 5, 6, 7).forall(i =>
        (r.isNullAt(i) && e.isNullAt(i)) || r.get(i) == e.get(i)))
    }
  }

  test("profileCertified: exact stats + within_tol true, TRUE-literal oracle form") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cols = (Seq("o_orderkey", "o_custkey", "o_totalprice"),
      Seq("o_orderstatus", "o_orderpriority"))
    val cert = Profiler.profileCertified(df, cols._1, cols._2)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Profiler.profile(df, cols._1, cols._2)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(cert.keySet == exact.keySet)
    for ((c, r) <- cert) {
      val e = exact(c)
      // certified rows carry the EXACT stats (cols 1..7), plus the flag
      assert((1 to 7).forall(i =>
        (r.isNullAt(i) && e.isNullAt(i)) || r.get(i) == e.get(i)), c)
      assert(r.getBoolean(r.fieldIndex("within_tol")), s"$c HLL outside tolerance")
    }
  }

  test("incremental summaries merge to the direct whole-table profile") {
    import org.apache.spark.sql.functions._
    val k = 8
    // 3 parts, overlapping keys across parts, > k distinct keys overall
    val df = (0 until 60).map(i => (s"p${i % 3}", i.toDouble, (i % 20).toLong))
      .toDF("part", "v", "key")
    val merged = Profiler.mergeSummaries(
      Profiler.incrementalSummaries(df, col("part"), "v", "key", k), k).head()
    assert(merged.getLong(0) == 60 && merged.getLong(1) == 3)
    assert(merged.getDouble(2) == 0.0 && merged.getDouble(3) == 59.0)
    // direct whole-table sketch: same distinct hash set → same estimate
    val hashes = df.select(
        graft.functions.TextFns.md5Hash32(col("key").cast("string")).as("h"))
      .distinct().as[Long]
      .select(new graft.operators.BottomKSketch(k).toColumn.name("kmv"))
      .head()
    val est = if (hashes._2.isEmpty) hashes._1.toDouble
      else (k - 1).toDouble / (hashes._2.get.toDouble / 4294967296.0)
    assert(merged.getDouble(4) == est, s"${merged.getDouble(4)} vs $est")
  }

  test("incremental summaries merge even when a part keeps fewer than k") {
    import org.apache.spark.sql.functions._
    val k = 64 // > distinct keys: estimate must be the EXACT count
    val df = (0 until 30).map(i => (s"p${i % 2}", i.toDouble, (i % 10).toLong))
      .toDF("part", "v", "key")
    val merged = Profiler.mergeSummaries(
      Profiler.incrementalSummaries(df, col("part"), "v", "key", k), k).head()
    assert(merged.getDouble(4) == 10.0)
  }

  test("KMV estimate over an unsaturated hash ARRAY is ANSI-safe and exact") {
    import org.apache.spark.sql.functions._
    // ANSI mode (Spark 4's default) makes element_at throw out of bounds;
    // the array-backed estimator path must use try_element_at and fall
    // back to the exact count below k elements
    val df = Seq((2L, Seq(10L, 20L))).toDF("cnt", "sk")
    val est = df.select(graft.operators.Kmv.estimate(8, col("cnt"),
      try_element_at(col("sk"), lit(8))).as("e")).head().getDouble(0)
    assert(est == 2.0)
  }

  test("histogram quantile summaries are mergeable and one-bin accurate") {
    import org.apache.spark.sql.functions._
    val bins = 16
    val ps = Seq(2500, 5000, 9000)
    // skewed values so bins are unevenly filled, split across 4 parts
    val df = (1 to 400).map(i => (s"p${i % 4}", (i * i).toDouble / 100.0))
      .toDF("part", "v")
    def quants(partCol: org.apache.spark.sql.Column): Map[Int, Double] =
      Profiler.histQuantiles(
        Profiler.histSummaries(df, partCol, "v", bins), bins, ps)
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // mergeability: per-part summaries folded together answer exactly
    // what a single whole-table summary answers
    val perPart = quants(col("part"))
    val whole = quants(lit("all"))
    assert(perPart == whole)
    // accuracy: within one bin width of the exact quantile
    val binW = df.agg((max(col("v")) - min(col("v"))).cast("double")).head()
      .getDouble(0) / bins
    val exact = graft.operators.Quantiles.exactQuantiles(
      df, "v", ps.map(_ / 10000.0))
    ps.zip(exact).foreach { case (p, ex) =>
      assert(math.abs(perPart(p) - ex) <= binW + 0.01,
        s"P$p: est ${perPart(p)} vs exact $ex (bin width $binW)")
    }
  }
}
