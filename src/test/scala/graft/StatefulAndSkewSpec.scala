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

  test("funnelStages: late view retroactively unlocks click+purchase; re-delivery idempotent") {
    import graft.streaming.StatefulOps.{FunnelEvent, FunnelProgress}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FunnelEvent]
    val q = StatefulOps.funnelStages(spark, in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    // click and purchase arrive FIRST: no view yet, stage must be 0
    in.addData(FunnelEvent(1, "click", ts(5)), FunnelEvent(1, "purchase", ts(6)))
    q.processAllAvailable()
    val afterB1 = spark.table("funnel_out").as[FunnelProgress].collect()
    assert(afterB1.last.stage == 0 && afterB1.last.t1 == -1L)
    // the view arrives LATE, earlier than both: unlocks the whole chain
    in.addData(FunnelEvent(1, "view", ts(1)))
    q.processAllAvailable()
    val afterB2 = spark.table("funnel_out").as[FunnelProgress].collect()
    assert(afterB2.last.stage == 3)
    assert(afterB2.last.t1 == ts(1).getTime && afterB2.last.t2 == ts(5).getTime
      && afterB2.last.t3 == ts(6).getTime)
    // re-delivering batch 1 must not change anything (min/set-union state)
    in.addData(FunnelEvent(1, "click", ts(5)), FunnelEvent(1, "purchase", ts(6)))
    q.processAllAvailable()
    val afterB3 = spark.table("funnel_out").as[FunnelProgress].collect()
    assert(afterB3.last == afterB2.last)
    q.stop()
  }

  test("funnelStages state survives a checkpointed kill/restart") {
    import graft.streaming.StatefulOps.{FunnelEvent, FunnelProgress}
    val src = tmpDir("funnel_src")
    val ckpt = tmpDir("funnel_ckpt")
    val out = tmpDir("funnel_restart_out")
    val schema = Seq(FunnelEvent(0L, "x", ts(0))).toDF().schema
    def run(): Unit = {
      val in = spark.readStream.schema(schema).parquet(src).as[FunnelEvent]
      val q = StatefulOps.funnelStages(spark, in)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", out).start()
      q.awaitTermination()
    }
    // run 1: click+purchase land first → stage 0, but their TIMES enter state
    Seq(FunnelEvent(1, "click", ts(5)), FunnelEvent(1, "purchase", ts(6)))
      .toDF().write.mode("append").parquet(src)
    run()
    assert(spark.read.parquet(out).as[FunnelProgress].collect()
      .map(_.stage).max == 0)
    // the query is gone; the late view lands; a NEW query on the same
    // checkpoint must resume the state store and unlock the full chain
    Seq(FunnelEvent(1, "view", ts(1))).toDF().write.mode("append").parquet(src)
    run()
    val rows = spark.read.parquet(out).as[FunnelProgress].collect()
    assert(rows.exists(r => r.stage == 3 && r.t2 == ts(5).getTime),
      s"restarted query must see the pre-kill click/purchase state: ${rows.toSeq}")
  }

  test("funnelStages agrees with a batch recomputation on shuffled real events") {
    import graft.streaming.StatefulOps.{FunnelEvent, FunnelProgress}
    implicit val sqlCtx = spark.sqlContext
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .filter(col("user_id") < 30)
      .select(col("user_id"), col("event_type"), col("ts").cast("timestamp").as("ts"))
      .as[FunnelEvent].collect()
    // deterministic shuffle: deliver in hash order, split into 3 batches —
    // plenty of cross-batch reordering against event time
    val shuffled = events.sortBy(e => (e.ts.getTime * 31 + e.user_id).hashCode)
    val batches = shuffled.grouped((shuffled.length + 2) / 3).toSeq
    val in = MemoryStream[FunnelEvent]
    val q = StatefulOps.funnelStages(spark, in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_batch_agree").start()
    batches.foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("funnel_batch_agree").as[FunnelProgress]
      .collect().groupBy(_.user_id).map { case (u, rows) => u -> rows.last.stage }
    // batch truth: the s21 definition folded directly
    val truth = events.groupBy(_.user_id).map { case (u, es) =>
      val t1 = es.filter(_.event_type == "view").map(_.ts.getTime)
        .minOption.getOrElse(-1L)
      val t2 = if (t1 < 0) -1L else es.filter(e => e.event_type == "click"
        && e.ts.getTime > t1).map(_.ts.getTime).minOption.getOrElse(-1L)
      val t3 = if (t2 < 0) -1L else es.filter(e => e.event_type == "purchase"
        && e.ts.getTime > t2).map(_.ts.getTime).minOption.getOrElse(-1L)
      u -> Seq(t1, t2, t3).takeWhile(_ >= 0).size
    }
    assert(streamed == truth)
    assert(truth.values.exists(_ == 3), "fixture must exercise full funnels")
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
