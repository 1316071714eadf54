package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{UserEvent, UserSummary}
import graft.util.Skew

class StatefulAndSkewSpec extends SparkSpec {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("flatMapGroupsWithState accumulates per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UserEvent]
    val q = StatefulOps.runningUserStats(spark, in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("stateful_out").start()
    in.addData(UserEvent(1, ts(0), 10.0), UserEvent(1, ts(1), 5.0), UserEvent(2, ts(0), 1.0))
    q.processAllAvailable()
    in.addData(UserEvent(1, ts(2), 2.0)) // state must carry n=2, sum=15
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("stateful_out").as[UserSummary].collect()
    val u1 = rows.filter(_.user_id == 1).maxBy(_.n)
    assert(u1.n == 3 && u1.sum == 17.0)
    assert(rows.exists(r => r.user_id == 2 && r.n == 1))
  }

  test("salted two-phase aggregation equals the direct groupBy") {
    val df = Seq.tabulate(1000)(i => (if (i % 10 == 0) "hot" else s"k${i % 7}", i.toLong, i.toDouble))
      .toDF("key", "id", "v")
    val direct = df.groupBy(col("key"))
      .agg(sum(col("v")).as("sum"), count(lit(1)).as("n"))
      .orderBy("key").collect()
    val salted = Skew.saltedSumCount(df, col("key"), col("id"), col("v"), salts = 8)
      .orderBy("key").collect()
    assert(direct.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ==
      salted.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq)
  }

  test("salt spreads a hot key across buckets") {
    val df = Seq.tabulate(512)(i => ("hot", i.toLong)).toDF("key", "id")
    val buckets = df.select(Skew.salt(col("id"), 8)).distinct().count()
    assert(buckets == 8)
  }

  test("AQE splits the skewed partition of a shuffle join (skew=true)") {
    // JOIN-side skew complement to the salted-AGG demo above: one hot key
    // owns most of the probe side, so one shuffle partition dwarfs the
    // rest — AQE's runtime re-plan (OptimizeSkewedJoin) must split it into
    // parallel sub-partitions instead of letting a straggler task carry
    // the whole key. Thresholds are lowered to trigger at test scale; at
    // 100 TB the defaults fire the same rewrite.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s2.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s2.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep the SMJ
    import s2.implicits._
    val pad = "x" * 64
    val left = Seq.tabulate(20000)(i =>
      (if (i % 10 != 0) 0L else i.toLong, s"$pad$i")).toDF("k", "lv")
    val right = Seq.tabulate(200)(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val joined = left.join(right, "k")
    // collect() (not count()) so the SAME queryExecution finalizes and the
    // AQE-rewritten plan is the one inspected
    assert(joined.collect().length == 18000 + 20) // hot key + distinct tail
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), s"AQE did not split the skew:\n$plan")
  }
}
