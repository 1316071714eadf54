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

  test("left-outer stream form: unmatched left rows null-pad exactly once, matches agree with batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val tol = 60000000L // 1 minute
    val clicks = Seq((1L, 100L), (2L, 200L), (3L, 290L), (4L, 1000L))
    val buys = Seq((10L, 130L), (11L, 199L), (12L, 260L), (13L, 2000L))
    val lIn = MemoryStream[(Long, Long)]
    val rIn = MemoryStream[(Long, Long)]
    val lDf = lIn.toDF().selectExpr("_1 AS l_id", "timestamp_seconds(_2) AS l_ts")
    val rDf = rIn.toDF().selectExpr("_1 AS r_id", "timestamp_seconds(_2) AS r_ts")
    val name = s"sij_lo_${System.nanoTime()}"
    val q = StreamingIntervalJoin
      .binnedTimePairsStreamLeftOuter(lDf, "l_ts", rDf, "r_ts", tol, "5 minutes")
      .select("l_id", "r_id")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    // cross-batch disorder: stragglers complete pairs from earlier batches
    lIn.addData(clicks.take(2)); rIn.addData(buys.drop(2))
    q.processAllAvailable()
    lIn.addData(clicks.drop(2)); rIn.addData(buys.take(2))
    q.processAllAvailable()
    // flush: push both watermarks far past every event so click 4's
    // unmatched null-pad (right wm past 1000s + tol) is released
    for (t <- Seq(100000L, 100001L, 100002L)) {
      lIn.addData(Seq((99L, t))); rIn.addData(Seq((99L, t)))
      q.processAllAvailable()
    }
    val got = spark.table(name).filter(col("l_id") < 90)
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
    q.stop()
    assert(got.size == got.distinct.size,
      s"duplicate rows (triplicate null-pad?) in ${got.sorted}")
    val expected = clicks.toDF("l_id", "sec")
      .selectExpr("l_id", "timestamp_seconds(sec) AS l_ts")
      .join(buys.toDF("r_id", "sec")
          .selectExpr("r_id", "timestamp_seconds(sec) AS r_ts"),
        abs(unix_micros(col("l_ts")) - unix_micros(col("r_ts"))) <= tol,
        "left_outer")
      .select("l_id", "r_id")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(got.toSet == expected, s"stream ${got.toSet} vs batch $expected")
    // the fixture really exercises both shapes
    assert(expected.contains((4L, None)), "unmatched click must null-pad")
    assert(expected.contains((1L, Some(10L))))
  }

  test("kill-and-restart from checkpoint: exactly-once pairs across the interrupted batch") {
    import spark.implicits._
    // deterministic two-stream fixture from the sf0.01 events table:
    // even event_ids are the left stream, odd the right; the SAME source
    // directory feeds two file-stream readers so the restart replays both
    // sides from the checkpointed offsets
    val tolUs = 900000000L // 15 minutes
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      .select(col("event_id").as("id"), col("ts").cast("timestamp").as("ets"))
    val src = tmpDir("sij_src")
    val ckpt = tmpDir("sij_ckpt")
    val out = tmpDir("sij_out")
    val ordered = ev.orderBy("ets").cache()
    val n = ordered.count()
    val cuts = ordered.select("ets").collect().map(_.getTimestamp(0))
    val bounds = (1 until 6).map(i => cuts((n * i / 6).toInt - 1))
    val slices = (lit(null).cast("timestamp") +: bounds.map(lit))
      .zip(bounds.map(lit) :+ lit(null).cast("timestamp"))
    slices.foreach { case (lo, hi) =>
      ordered.filter(
        (isnull(lo) || col("ets") > lo) && (isnull(hi) || col("ets") <= hi))
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100) // distinct mtimes → deterministic source order
    }
    ordered.unpersist()
    def start() = {
      def side(even: Boolean, idN: String, tsN: String) =
        spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(src)
          .filter(if (even) col("id") % 2 === 0 else col("id") % 2 === 1)
          .select(col("id").as(idN), col("ets").as(tsN))
      StreamingIntervalJoin.binnedTimePairsStream(
          side(even = true, "l_id", "l_ts"), "l_ts",
          side(even = false, "r_id", "r_ts"), "r_ts",
          tolUs, "30 minutes")
        .select("l_id", "r_id")
        .writeStream.outputMode("append").format("parquet")
        .option("checkpointLocation", ckpt).option("path", out).start()
    }
    // run a few micro-batches, kill mid-stream; the interrupted batch
    // replays on restart against checkpointed join state (exactly-once
    // via the file sink's batch-id log + deterministic join)
    val q1 = start()
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.length < 3 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    q1.stop(); q1.awaitTermination()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop(); q2.awaitTermination()
    val got = spark.read.parquet(out)
    val gotRows = got.count()
    val gotDistinct = got.distinct().count()
    assert(gotRows == gotDistinct,
      s"duplicate pairs after restart: $gotRows rows, $gotDistinct distinct")
    val expected = IntervalJoin.binnedTimePairs(
        ev.filter(col("id") % 2 === 0).select(col("id").as("l_id"), col("ets").as("l_ts")),
        "l_ts",
        ev.filter(col("id") % 2 === 1).select(col("id").as("r_id"), col("ets").as("r_ts")),
        "r_ts", tolUs)
      .select("l_id", "r_id")
    val exN = expected.count()
    assert(gotRows == exN, s"pair count $gotRows != batch $exN")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "pair sets diverge from the batch operator")
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
