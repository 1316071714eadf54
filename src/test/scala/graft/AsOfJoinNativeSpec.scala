package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.AsOfJoinNative

/** Native as-of join operator (LogicalPlan + Strategy + BinaryExecNode):
  * parity with the composed union+window form on edge cases and real data.
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  val ordersT = Seq(
    (10L, 100L, "2024-01-01 00:00:00", 5.0),
    (11L, 100L, "2024-01-10 00:00:00", 7.0),
    (12L, 100L, "2024-01-10 00:00:00", 9.0), // tie: max orderkey wins
    (13L, 200L, "2024-06-01 00:00:00", 1.0),
  ).toDF("o_orderkey", "o_custkey", "o_ts", "o_price")
    .withColumn("o_ts", col("o_ts").cast("timestamp"))

  val eventsT = Seq(
    (1L, 100L, "2024-01-05 00:00:00"),
    (2L, 100L, "2024-01-10 00:00:00"), // ties included (<=), tiebreak 12
    (3L, 100L, "2024-02-01 00:00:00"),
    (4L, 200L, "2024-01-01 00:00:00"), // before any right row → null
    (5L, 999L, "2024-01-01 00:00:00"), // no right key → null
  ).toDF("event_id", "user_id", "ts")
    .withColumn("ts", col("ts").cast("timestamp"))

  test("native exec: <= semantics, tiebreak, null on no-match") {
    val out = AsOfJoinNative.backward(eventsT, ordersT,
      "user_id", "o_custkey", "ts", "o_ts", Seq("o_orderkey", "o_price"), "o_orderkey")
      .orderBy("event_id").collect()
    val keys = out.map(r => Option(r.getAs[java.lang.Long]("o_orderkey")).map(_.toLong))
    assert(keys.toSeq == Seq(Some(10L), Some(12L), Some(12L), None, None))
    assert(out(1).getAs[Double]("o_price") == 9.0)
  }

  test("native exec equals the composed union+window form on testdata") {
    val t = graft.util.Tables(spark, "/root/testdata/sf0.001")
    val ev = t.events.select(col("event_id"), col("user_id"), col("ts"))
    val native = AsOfJoinNative.backward(ev, t.orders,
      "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
      .select("event_id", "o_orderkey", "o_totalprice")
    val composed = AsOfJoin.backward(ev, t.orders,
      "user_id", "o_custkey", "ts", "o_orderdate",
      Seq("o_orderkey", "o_totalprice"), "o_orderkey")
      .select("event_id", "o_orderkey", "o_totalprice")
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
    assert(native.count() == ev.count())
  }

  test("native exec with STRING keys: stale match does not leak across keys") {
    // buffer-backed key types alias the projection's reused row; a key
    // change must clear the remembered match (regression test)
    val right = Seq(("AAA", "2024-01-01 00:00:00", 1.0))
      .toDF("k", "rts", "payload").withColumn("rts", col("rts").cast("timestamp"))
    val left = Seq(("AAA", "2024-01-02 00:00:00", 1L), ("BBB", "2024-01-02 00:00:00", 2L))
      .toDF("k", "lts", "row_id").withColumn("lts", col("lts").cast("timestamp"))
    val out = AsOfJoinNative.backward(left, right, "k", "k", "lts", "rts",
      Seq("payload"), "payload")
      .orderBy("row_id").collect()
    assert(out(0).getAs[Any]("payload") == 1.0)
    assert(out(1).isNullAt(out(1).fieldIndex("payload"))) // BBB must NOT inherit AAA's match
  }

  test("native exec coerces a DATE right-time against a timestamp left-time") {
    val right = ordersT.withColumn("o_ts", to_date(col("o_ts")))
    val out = AsOfJoinNative.backward(eventsT, right,
      "user_id", "o_custkey", "ts", "o_ts", Seq("o_orderkey", "o_price"), "o_orderkey")
      .orderBy("event_id").collect()
    val keys = out.map(r => Option(r.getAs[java.lang.Long]("o_orderkey")).map(_.toLong))
    // same answers as the all-timestamp test: dates cast to midnight
    assert(keys.toSeq == Seq(Some(10L), Some(12L), Some(12L), None, None))
  }

  test("native exec plan contains the custom operator and two sorted exchanges") {
    val out = AsOfJoinNative.backward(eventsT, ordersT,
      "user_id", "o_custkey", "ts", "o_ts", Seq("o_price"), "o_orderkey")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert("Sort ".r.findAllIn(plan).size >= 2, plan)
  }
}
