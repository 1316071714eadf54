package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.IntervalJoin

class IntervalJoinSpec extends SparkSpec {

  private def side(name: String, ts: Seq[(Long, String)]) = {
    val schema = StructType(Seq(
      StructField(s"${name}_id", LongType),
      StructField(s"${name}_ts", TimestampType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        ts.map { case (id, t) => Row(id, Timestamp.valueOf(t)) }, 3), schema)
  }

  test("binnedTimePairs equals the brute-force range join, boundary inclusive, no dups") {
    val tol = 60000000L // 1 minute
    val l = side("l", Seq(
      1L -> "2024-01-01 10:00:00",
      2L -> "2024-01-01 10:05:00",
      3L -> "2024-01-01 23:59:40"))
    val r = side("r", Seq(
      10L -> "2024-01-01 10:00:30",   // within 1 min of l1
      11L -> "2024-01-01 10:01:00",   // EXACTLY 60s from l1 — boundary keeps
      12L -> "2024-01-01 10:01:00.000001", // 60s + 1us — must drop
      13L -> "2024-01-01 10:04:10",   // within of l2
      14L -> "2024-01-02 00:00:30"))  // within of l3 across midnight
    val got = IntervalJoin.binnedTimePairs(l, "l_ts", r, "r_ts", tol)
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    def us(t: String): Long = {
      val ts = Timestamp.valueOf(t)
      (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L
    }
    val brute = for {
      (li, lt) <- Seq(1L -> "2024-01-01 10:00:00", 2L -> "2024-01-01 10:05:00",
        3L -> "2024-01-01 23:59:40")
      (ri, rt) <- Seq(10L -> "2024-01-01 10:00:30", 11L -> "2024-01-01 10:01:00",
        12L -> "2024-01-01 10:01:00.000001", 13L -> "2024-01-01 10:04:10",
        14L -> "2024-01-02 00:00:30")
      if math.abs(us(lt) - us(rt)) <= tol
    } yield (li, ri)
    assert(got.size == got.distinct.size, s"duplicate pairs in $got")
    assert(got.toSet == brute.toSet, s"got ${got.toSet} vs brute ${brute.toSet}")
    assert(got.toSet == Set((1L, 10L), (1L, 11L), (2L, 13L), (3L, 14L)))
  }

  test("binnedTimePairs plans as an equi-join, never BNLJ/cartesian") {
    val l = side("l", (1 to 50).map(i => (i.toLong, f"2024-01-01 10:${i % 60}%02d:00")))
    val r = side("r", (1 to 50).map(i => (100L + i, f"2024-01-01 10:${(i * 7) % 60}%02d:30")))
    val joined = IntervalJoin.binnedTimePairs(l, "l_ts", r, "r_ts", 60000000L)
    joined.collect()
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), plan)
  }

  test("planted burst bucket: AQE splits the hot bin (skew=true), pairs stay exact") {
    // the "hot buckets are ordinary AQE skew" claim (IntervalJoin scaladoc),
    // proven instead of asserted: an event BURST packs one tolerance window
    // — one bin key owns almost the whole shuffle — and OptimizeSkewedJoin
    // must split that partition into parallel sub-reads rather than leave
    // a straggler task. Thresholds lowered to fire at test scale; at 100 TB
    // the defaults fire the same rewrite on real burst sizes.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep the SMJ
    import s2.implicits._
    val tolUs = 1000000L // 1s buckets
    val pad = "x" * 64
    // burst: 30k right rows inside ONE second (bin 5), plus a uniform tail;
    // left: 50 probes in the burst window + 50 spread over the tail hours
    val right = ((0 until 30000).map(i =>
        (5000000L + (i % 1000) * 1000L, s"burst$pad$i")) ++
      (0 until 2000).map(i => (3600000000L + i * 1700000L, s"tail$pad$i")))
      .toDF("r_us", "r_tag")
      .select(timestamp_micros(col("r_us")).as("r_ts"), col("r_tag"), col("r_us"))
    val left = ((0 until 50).map(i => (100L + i, 5200000L + i * 11000L)) ++
      (0 until 50).map(i => (200L + i, 3600000000L + i * 61000000L)))
      .toDF("l_id", "l_us")
      .select(col("l_id"), timestamp_micros(col("l_us")).as("l_ts"), col("l_us"))
    val t0 = System.nanoTime()
    val joined = IntervalJoin.binnedTimePairs(left, "l_ts", right, "r_ts", tolUs)
      .select(col("l_id"), col("l_us"), col("r_us"))
    val got = joined.collect()
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    // exactness under the burst: brute-force the expected pair count on
    // the driver (100 × 32k comparisons)
    val rUs = ((0 until 30000).map(i => 5000000L + (i % 1000) * 1000L) ++
      (0 until 2000).map(i => 3600000000L + i * 1700000L))
    val lUs = (0 until 50).map(i => 5200000L + i * 11000L) ++
      (0 until 50).map(i => 3600000000L + i * 61000000L)
    val expected = lUs.map(l => rUs.count(r => math.abs(l - r) <= tolUs)).sum
    assert(got.length == expected, s"pairs ${got.length} vs brute $expected")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"AQE did not split the hot bin:\n$plan")
    // no straggler cliff at test scale (generous bound — the point is the
    // split happened, not micro-timing)
    assert(elapsedSec < 60.0, s"burst join took ${elapsedSec}s")
  }

  test("binnedTimePairs rejects a non-positive tolerance") {
    val l = side("l", Seq(1L -> "2024-01-01 10:00:00"))
    intercept[IllegalArgumentException] {
      IntervalJoin.binnedTimePairs(l, "l_ts", l, "l_ts", 0L)
    }
  }
}
