package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** approxDistinctUsers: the per-window KMV distinct-users sketch on a
  * stream — equality with the batch computation, duplicate tolerance, and
  * the kth-hash estimation path (k smaller than the distinct count).
  */
class StreamingKmvSpec extends SparkSpec {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  /** Batch replay of the same sketch (the s18 query shape, window start as
    * timestamp), for stream ≡ batch assertions.
    */
  private def batchKmv(rows: Seq[Ev], k: Int) = {
    val hashed = rows.toDF()
      .select(window(col("ts"), "1 hour").getField("start").as("ws"),
        col("user_id"))
      .distinct()
      .select(col("ws"), graft.functions.TextFns
        .md5Hash32(col("user_id").cast("string")).as("h"))
      .distinct()
    hashed.as[(Timestamp, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new graft.operators.BottomKSketch(k).toColumn.name("kmv"))
      .toDF("window_start", "kmv")
      .select(col("window_start"),
        when(col("kmv._2").isNull, col("kmv._1").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (col("kmv._2").cast("double") / lit(4294967296.0)))
          .as("est_users"),
        col("kmv._1").as("n_distinct_hashes"))
  }

  test("stream equals batch, dups within watermark dropped, kth path hit") {
    implicit val sqlCtx = spark.sqlContext
    val k = 3 // smaller than the distinct count → kth-hash estimate path
    val in = MemoryStream[Ev]
    val q = EventStreams.approxDistinctUsers(in.toDF(), "1 hour",
        "30 minutes", k)
      .writeStream.outputMode("append")
      .format("memory").queryName("kmv_out").start()
    // window 10:00: users 1..5, user 1 re-delivered across micro-batches
    val w1 = Seq(
      Ev(1, ts(1), 1, "c", 1.0), Ev(2, ts(2), 2, "c", 1.0),
      Ev(3, ts(3), 3, "c", 1.0))
    val w1b = Seq(
      Ev(4, ts(4), 1, "c", 1.0), // dup user within watermark → dropped
      Ev(5, ts(5), 4, "c", 1.0), Ev(6, ts(6), 5, "c", 1.0))
    in.addData(w1: _*)
    q.processAllAvailable()
    in.addData(w1b: _*)
    q.processAllAvailable()
    // push the watermark past 11:00 so the 10:00 window finalizes
    in.addData(Ev(9, Timestamp.valueOf("2024-01-01 12:00:00"), 9, "c", 1.0))
    q.processAllAvailable()
    val got = spark.table("kmv_out")
      .select("window_start", "est_users", "n_distinct_hashes")
      .as[(Timestamp, Double, Long)].collect().toSeq
    assert(got.size == 1, got)
    val exp = batchKmv(w1 ++ w1b, k)
      .filter(col("window_start") === lit(ts(0)))
      .as[(Timestamp, Double, Long)].collect().head
    assert(got.head._3 == 5L, got)           // exact distinct count kept
    assert(got.head == exp, s"stream=$got batch=$exp")
    q.stop()
  }

  test("under-k windows report the exact count as the estimate") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.approxDistinctUsers(in.toDF(), "1 hour",
        "30 minutes", 256)
      .writeStream.outputMode("append")
      .format("memory").queryName("kmv_out2").start()
    in.addData(Ev(1, ts(1), 1, "c", 1.0), Ev(2, ts(2), 2, "c", 1.0))
    q.processAllAvailable()
    in.addData(Ev(3, Timestamp.valueOf("2024-01-01 12:00:00"), 3, "c", 1.0))
    q.processAllAvailable()
    val got = spark.table("kmv_out2")
      .select("est_users", "n_distinct_hashes")
      .as[(Double, Long)].collect().toSeq
    assert(got == Seq((2.0, 2L)), got)
    q.stop()
  }
}
