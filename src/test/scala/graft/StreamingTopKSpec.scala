package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingTopK

/** Streaming SpaceSaving frequent-items: cross-batch accumulation, the
  * est−err ≤ true ≤ est invariant under eviction, bounded state.
  */
class StreamingTopKSpec extends SparkSpec {

  test("counts accumulate across micro-batches; latest summary is upserted") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val q = StreamingTopK.frequentItems(in.toDF().toDF("item"), "item",
        buckets = 4, capacity = 8)
      .writeStream.outputMode("update")
      .format("memory").queryName("stopk_out").start()
    in.addData(Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c"): _*)
    q.processAllAvailable()
    in.addData(Seq.fill(4)("a") ++ Seq.fill(2)("c"): _*)
    q.processAllAvailable()
    q.stop()
    // latest emission per (bucket, value) is the current summary
    val latest = spark.table("stopk_out")
      .groupBy("bucket", "value").agg(max(struct(col("est"), col("err"))).as("s"))
      .select(col("value"), col("s.est").as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(latest("a") == 9L)
    assert(latest("b") == 3L)
    assert(latest("c") == 3L)
  }

  test("eviction under cap keeps the SpaceSaving invariant, state bounded") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    // ONE bucket, capacity 3 — force evictions over 6 distinct items
    val q = StreamingTopK.frequentItems(in.toDF().toDF("item"), "item",
        buckets = 1, capacity = 3)
      .writeStream.outputMode("update")
      .format("memory").queryName("stopk_cap").start()
    val truth = Seq.fill(10)("x") ++ Seq.fill(6)("y") ++ Seq.fill(3)("z") ++
      Seq("p", "q", "r")
    in.addData(truth.take(8): _*)
    q.processAllAvailable()
    in.addData(truth.drop(8): _*)
    q.processAllAvailable()
    q.stop()
    val trueCounts = truth.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rows = spark.table("stopk_cap")
      .groupBy("value").agg(max(struct(col("est"), col("err"))).as("s"))
      .select(col("value"), col("s.est").as("est"), col("s.err").as("err"))
      .collect()
    // summary never exceeds capacity entries in its final batch
    assert(rows.length <= 6) // across both emissions, few distinct values
    rows.foreach { r =>
      val (v, est, err) = (r.getString(0), r.getLong(1), r.getLong(2))
      val t = trueCounts.getOrElse(v, 0L)
      assert(est >= t, s"$v: est $est < true $t")
      assert(est - err <= t, s"$v: est-err ${est - err} > true $t")
    }
  }
}
