package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin
import graft.streaming.StreamingIntervalJoin

class StreamingIntervalJoinSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("stream-stream binned time join equals the batch operator under reordering") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tol = 60000000L // 1 minute buckets
    // clicks (left) and purchases (right), interleaved out of order across
    // micro-batches but within the 5-minute watermark
    val clicks = Seq((1L, 100L), (2L, 200L), (3L, 290L), (4L, 1000L))
    val buys = Seq((10L, 130L), (11L, 199L), (12L, 260L), (13L, 2000L))
    val lIn = MemoryStream[(Long, Long)]
    val rIn = MemoryStream[(Long, Long)]
    val lDf = lIn.toDF().selectExpr("_1 AS l_id", "timestamp_seconds(_2) AS l_ts")
    val rDf = rIn.toDF().selectExpr("_1 AS r_id", "timestamp_seconds(_2) AS r_ts")
    val name = s"sij_out_${System.nanoTime()}"
    val q = StreamingIntervalJoin
      .binnedTimePairsStream(lDf, "l_ts", rDf, "r_ts", tol, "5 minutes")
      .select("l_id", "r_id")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    // batch 1: some of each side; batch 2: the stragglers arrive LATER
    // than pairs they complete (cross-batch disorder)
    lIn.addData(clicks.take(2)); rIn.addData(buys.drop(2))
    q.processAllAvailable()
    lIn.addData(clicks.drop(2)); rIn.addData(buys.take(2))
    q.processAllAvailable()
    // flush: advance both watermarks far past every event
    lIn.addData(Seq((99L, 100000L))); rIn.addData(Seq((99L, 100000L)))
    q.processAllAvailable()
    lIn.addData(Seq((98L, 100001L))); rIn.addData(Seq((98L, 100001L)))
    q.processAllAvailable()
    val got = spark.table(name).filter(col("l_id") < 90)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    q.stop()
    // exactly-once pairs: one home bucket x 3 distinct probe buckets
    assert(got.size == got.distinct.size, s"duplicate pairs in ${got.sorted}")
    val expected = IntervalJoin.binnedTimePairs(
        clicks.toDF("l_id", "sec").selectExpr("l_id", "timestamp_seconds(sec) AS l_ts"),
        "l_ts",
        buys.toDF("r_id", "sec").selectExpr("r_id", "timestamp_seconds(sec) AS r_ts"),
        "r_ts", tol)
      .select("l_id", "r_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.toSet == expected, s"stream ${got.toSet} vs batch $expected")
    // sanity: the fixture really exercises matches and non-matches
    assert(expected.contains((1L, 10L)) && expected.contains((3L, 12L)))
    assert(!expected.exists(_._1 == 4L)) // 1000s is > 1min from everything
  }

  test("state is evicted once the watermark passes ts + tolerance") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val lIn = MemoryStream[(Long, Long)]
    val rIn = MemoryStream[(Long, Long)]
    val lDf = lIn.toDF().selectExpr("_1 AS l_id", "timestamp_seconds(_2) AS l_ts")
    val rDf = rIn.toDF().selectExpr("_1 AS r_id", "timestamp_seconds(_2) AS r_ts")
    val name = s"sij_state_${System.nanoTime()}"
    val q = StreamingIntervalJoin
      .binnedTimePairsStream(lDf, "l_ts", rDf, "r_ts", 60000000L, "1 minute")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    def stateRows: Long = {
      val p = q.lastProgress
      if (p == null) -1L else p.stateOperators.map(_.numRowsTotal).sum
    }
    lIn.addData(Seq((1L, 100L), (2L, 110L))); rIn.addData(Seq((10L, 105L)))
    q.processAllAvailable()
    val resident = stateRows
    assert(resident >= 3, s"expected buffered rows, state=$resident")
    // push both watermarks ~half an hour past the events; buffered rows
    // age out (a couple of ticks let the eviction land)
    for (t <- Seq(2000L, 2010L, 2020L)) {
      lIn.addData(Seq((90L + t % 10, t))); rIn.addData(Seq((90L + t % 10, t)))
      q.processAllAvailable()
    }
    val after = stateRows
    q.stop()
    // the 3 flush ticks added 6 rows of their own; if nothing had aged
    // out, state would be at least resident + 6 — below that bound, the
    // original events' buffers provably evicted
    assert(after < resident + 6,
      s"state did not age out: peak=$resident after=$after")
  }
}
