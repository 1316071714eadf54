package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.AsOfJoin
import graft.streaming.StreamingAsOf
import graft.streaming.StreamingAsOf.AsOfEvent

class StreamingAsOfSpec extends SparkSpec {

  private def ts(sec: Long) = new Timestamp(sec * 1000L)
  private def quote(key: String, sec: Long, v: Double) =
    AsOfEvent(key, "quote", ts(sec), 0L, v)
  private def trade(key: String, sec: Long, id: Long, v: Double) =
    AsOfEvent(key, "trade", ts(sec), id, v)

  /** Run the stream over `batches`, then push the watermark far past every
    * trade with two flush batches, and collect the emitted matches.
    */
  private def run(batches: Seq[Seq[AsOfEvent]]): Set[(String, Long, Long, Boolean, Long, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[AsOfEvent]
    val name = s"asof_out_${System.nanoTime()}"
    // the delay must cover the test's largest cross-batch reorder (Spark
    // itself drops rows older than the watermark before the operator sees
    // them — reorderings BEYOND the declared lateness are out of contract)
    val q = StreamingAsOf.asOfJoinStream(spark, in.toDS(), delay = "200 seconds")
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    // two flush batches: the first advances the watermark, the second
    // gives the event-time timeouts a trigger to fire in
    in.addData(quote("zzz_flush", 100000L, 0.0)); q.processAllAvailable()
    in.addData(quote("zzz_flush", 100001L, 0.0)); q.processAllAvailable()
    val rows = spark.table(name)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4), r.getLong(5), r.getDouble(6))).toSet
    q.stop()
    rows.filterNot(_._1 == "zzz_flush")
  }

  test("stream matches the batch backward as-of under cross-batch reordering") {
    import spark.implicits._
    val quotes = Seq(("A", 10L, 1.0), ("A", 50L, 2.0), ("A", 90L, 3.0),
      ("B", 40L, 9.0))
    val trades = Seq(("A", 45L, 1L, 100.0), ("A", 95L, 2L, 200.0),
      ("B", 30L, 3L, 300.0), ("B", 60L, 4L, 400.0))
    // out of order: A's 50s quote arrives AFTER the 95s trade; B's only
    // quote arrives last
    val batches = Seq(
      Seq(quote("A", 10, 1.0), trade("A", 45, 1L, 100.0)),
      Seq(trade("A", 95, 2L, 200.0), quote("A", 90, 3.0), trade("B", 30, 3L, 300.0)),
      Seq(quote("A", 50, 2.0), trade("B", 60, 4L, 400.0), quote("B", 40, 9.0)))
    val got = run(batches)
    val batchExpected = AsOfJoin.backward(
        trades.toDF("key", "sec", "id", "tv")
          .selectExpr("key", "timestamp_seconds(sec) AS tts", "id", "tv"),
        quotes.toDF("key", "sec", "qv")
          .selectExpr("key", "timestamp_seconds(sec) AS qts", "qv"),
        "key", "key", "tts", "qts", payloadCols = Seq("qts", "qv"),
        rightTiebreak = "qv")
      .selectExpr("key", "id", "CAST(unix_millis(tts) AS BIGINT)",
        "qts IS NOT NULL",
        "COALESCE(CAST(unix_millis(qts) AS BIGINT), -1)",
        "COALESCE(qv, 0.0)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got == batchExpected, s"stream $got\nvs batch $batchExpected")
    // and the reordered quote really is the one that matched trade 4
    assert(got.exists(m => m._2 == 4L && m._4 && m._5 == 40000L && m._6 == 9.0))
  }

  test("a quote arriving late (within the watermark) still wins its trade") {
    val got = run(Seq(
      Seq(trade("K", 100, 7L, 1.0)),          // trade first, no quote yet
      Seq(quote("K", 90, 42.0))))             // its quote arrives a batch later
    assert(got == Set(("K", 7L, 100000L, true, 90000L, 42.0)))
  }

  test("kill-and-restart from checkpoint resumes exactly-once at sf0.1 volume (ST1)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // deterministic trade/quote stream derived from the sf0.1 events table
    // (100k events, 8 keys): even event_ids are quotes, odd are trades
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .select(
        concat(lit("K"), (col("user_id") % 8).cast("string")).as("key"),
        when(col("event_id") % 2 === 0, "quote").otherwise("trade").as("side"),
        col("ts").cast("timestamp").as("ts"), // parquet ntz → session-tz ts
        col("event_id").as("id"),
        col("value"))
    val src = tmpDir("asof_src")
    val ckpt = tmpDir("asof_ckpt")
    val out = tmpDir("asof_out")
    // 8 time-range files written sequentially (distinct mtimes) so the
    // file source replays them in event-time order, one per micro-batch
    val ordered = ev.orderBy("ts").cache()
    val n = ordered.count()
    val cuts = ordered.select("ts").collect().map(_.getTimestamp(0))
    val bounds = (1 until 8).map(i => cuts((n * i / 8).toInt - 1))
    val slices = (lit(null).cast("timestamp") +: bounds.map(lit))
      .zip(bounds.map(lit) :+ lit(null).cast("timestamp"))
    slices.foreach { case (lo, hi) =>
      ordered.filter(
        (isnull(lo) || col("ts") > lo) && (isnull(hi) || col("ts") <= hi))
        .coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100) // distinct file mtimes → deterministic source order
    }
    def start() = {
      val in = spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(src).as[AsOfEvent]
      // maxKept must cover the WORST-case pending per key: a restart can
      // coalesce several source files into one micro-batch (observed in
      // full-suite runs), so bound = all trades of one key (~6250) with
      // margin. Undersizing is not a silent bug — the operator drops with
      // capped=true — but this test asserts zero caps below.
      StreamingAsOf.asOfJoinStream(spark, in, delay = "10 minutes",
          maxKept = 16384)
        .writeStream.outputMode("append").format("parquet")
        .option("checkpointLocation", ckpt).option("path", out).start()
    }
    // run ~3 micro-batches, then kill; the interrupted batch replays on
    // restart against the checkpointed state (exactly-once via the file
    // sink's batch-id log + the operator's pending/emitted id guards)
    val q1 = start()
    val deadline = System.currentTimeMillis() + 120000
    while (q1.recentProgress.length < 3 && System.currentTimeMillis() < deadline)
      Thread.sleep(200)
    q1.stop(); q1.awaitTermination()
    val q2 = start()
    q2.processAllAvailable()
    // two sentinel files: advance the watermark past every trade, then
    // give the event-time timeouts a trigger to drain the last pending
    val maxTs = cuts.last.getTime
    for (k <- 0 to 1) {
      Seq(("zzz", "quote", new Timestamp(maxTs + 86400000L * (k + 1)), 0L, 0.0))
        .toDF("key", "side", "ts", "id", "value")
        .coalesce(1).write.mode("append").parquet(src)
      q2.processAllAvailable()
    }
    q2.stop(); q2.awaitTermination()
    val outDf = spark.read.parquet(out).filter(col("key") =!= "zzz")
    // a capped row means the state bound truncated data — that is the
    // operator being LOUD about a too-small maxKept, and it must fail
    // here with a diagnosis rather than as an opaque set diff
    val nCapped = outDf.filter(col("capped")).count()
    assert(nCapped == 0, s"$nCapped capped emissions: maxKept too small " +
      "for this volume (a restart batch can coalesce several files)")
    val got = outDf
      .select("key", "trade_id", "trade_ts", "matched", "quote_ts", "quote_value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getLong(4), r.getDouble(5))).toSet
    val expected = graft.operators.AsOfJoin.backward(
        ev.filter(col("side") === "trade")
          .select(col("key"), col("ts").as("tts"), col("id"), col("value")),
        ev.filter(col("side") === "quote")
          .select(col("key"), col("ts").as("qts"), col("value").as("qv")),
        "key", "key", "tts", "qts", payloadCols = Seq("qts", "qv"),
        rightTiebreak = "qv")
      .selectExpr("key", "id", "CAST(unix_millis(tts) AS BIGINT)",
        "qts IS NOT NULL",
        "COALESCE(CAST(unix_millis(qts) AS BIGINT), -1)",
        "COALESCE(qv, 0.0)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getDouble(5))).toSet
    ordered.unpersist()
    assert(got.size == expected.size,
      s"stream emitted ${got.size} vs batch ${expected.size}")
    assert(got == expected)
  }

  test("idle keys are evicted after idleRetention; active keys keep state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[AsOfEvent]
    val name = s"asof_evict_${System.nanoTime()}"
    val q = StreamingAsOf.asOfJoinStream(spark, in.toDS(),
        delay = "10 seconds", idleRetention = Some("60 seconds"))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    def stateRows: Long = {
      val p = q.lastProgress
      if (p == null) -1L else p.stateOperators.map(_.numRowsTotal).sum
    }
    // two keys get quotes; DEAD never sees another event, LIVE stays active
    in.addData(quote("DEAD", 10, 1.0), quote("LIVE", 10, 2.0))
    q.processAllAvailable()
    // advance the watermark ~50s past DEAD's quote — inside the 60s
    // retention, both keys must still hold state
    in.addData(quote("LIVE", 70, 3.0))
    q.processAllAvailable()
    in.addData(quote("LIVE", 71, 3.5)) // extra tick so timeouts fire
    q.processAllAvailable()
    assert(stateRows >= 2, s"expected both keys resident, state=$stateRows")
    // push the watermark past DEAD's quote + 60s retention; LIVE keeps
    // producing so it stays. A further tick lets DEAD's timeout fire.
    in.addData(quote("LIVE", 100, 4.0))
    q.processAllAvailable()
    in.addData(quote("LIVE", 101, 4.5))
    q.processAllAvailable()
    in.addData(quote("LIVE", 102, 5.0))
    q.processAllAvailable()
    assert(stateRows == 1, s"expected only LIVE resident, state=$stateRows")
    // and a trade on the evicted key arriving later is an ordinary as-of
    // miss (matched=false), never a wrong quote
    in.addData(trade("DEAD", 105, 99L, 7.0))
    q.processAllAvailable()
    in.addData(quote("LIVE", 130, 6.0))
    q.processAllAvailable()
    in.addData(quote("LIVE", 131, 6.5))
    q.processAllAvailable()
    val dead = spark.table(name)
      .filter(org.apache.spark.sql.functions.col("key") === "DEAD").collect()
    assert(dead.length == 1 && !dead.head.getAs[Boolean]("matched"),
      dead.mkString(", "))
    q.stop()
  }

  test("default retention is infinite: a long-idle key still matches its old quote") {
    // ~25h of event time passes with no activity on IDLE — far beyond any
    // plausible TTL. With idleRetention unset (the default) the quote MUST
    // survive and the late trade matches it, preserving exact stream≡batch
    // parity; an eviction default would silently emit matched=false here.
    val got = run(Seq(
      Seq(quote("IDLE", 10, 5.0)),
      Seq(quote("W", 90000, 1.0)),             // watermark → ~89800s
      Seq(trade("IDLE", 95000, 7L, 1.0))))
    assert(got.contains(("IDLE", 7L, 95000000L, true, 10000L, 5.0)), got)
  }

  test("re-delivered trade ids emit exactly once") {
    val got = run(Seq(
      Seq(quote("K", 10, 5.0), trade("K", 20, 11L, 1.0)),
      Seq(trade("K", 20, 11L, 1.0)),          // duplicate while pending
      Seq(quote("K", 99990, 6.0)),            // watermark passes, emits
      Seq(trade("K", 20, 11L, 1.0))))         // duplicate after emission
    assert(got == Set(("K", 11L, 20000L, true, 10000L, 5.0)))
  }
}
