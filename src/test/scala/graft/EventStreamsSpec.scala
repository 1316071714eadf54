package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming semantics (SURVEY.md §5.5): watermark + windows over a
  * MemoryStream, late-data dropping, session merging, and the checkpointed
  * restart / exactly-once ingest (ST1/ST2).
  */
// top-level so Spark can derive an Encoder (inner classes can't be encoded)
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("tumbling window with watermark finalizes and drops late data") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.tumblingAgg(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("tumble_out").start()
    in.addData(
      Ev(1, ts(1), 1, "click", 1.0), Ev(2, ts(4), 1, "click", 2.0),
      Ev(3, ts(12), 2, "view", 3.0))
    q.processAllAvailable()
    // watermark = max(ts) - 5m = 10:07 → 10:00 window not yet final
    assert(spark.table("tumble_out").count() == 0)
    // push watermark past 10:10 → the 10:00 window finalizes
    in.addData(Ev(4, ts(20), 1, "click", 4.0))
    q.processAllAvailable()
    val finalized = spark.table("tumble_out").collect()
    assert(finalized.length == 1)
    assert(finalized.head.getAs[Long]("n") == 2) // events 1,2
    // a late event for the finalized 10:00 window is dropped
    in.addData(Ev(5, ts(2), 9, "click", 9.0))
    q.processAllAvailable()
    assert(spark.table("tumble_out").count() == 1)
    q.stop()
  }

  test("session window merges events within the gap across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.sessionAgg(in.toDF(), "10 minutes", "0 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    in.addData(Ev(1, ts(0), 1, "c", 1.0), Ev(2, ts(5), 1, "c", 1.0)) // one session
    q.processAllAvailable()
    in.addData(Ev(3, ts(40), 1, "c", 1.0)) // gap > 10m → new session; finalizes first
    q.processAllAvailable()
    in.addData(Ev(4, ts(59), 1, "c", 1.0)) // push watermark; finalizes second
    q.processAllAvailable()
    val sessions = spark.table("sess_out").orderBy("session_start").collect()
    assert(sessions.length >= 1)
    assert(sessions.head.getAs[Long]("n_events") == 2)
    q.stop()
  }

  test("checkpointed ingest is exactly-once across restarts (ST1/ST2)") {
    val src = tmpDir("stream_src")
    val ckpt = tmpDir("stream_ckpt")
    val out = tmpDir("stream_out")
    val schema = Seq(Ev(0, ts(0), 0, "x", 0.0)).toDF().schema

    Seq(Ev(1, ts(1), 1, "a", 1.0), Ev(2, ts(2), 1, "b", 2.0)).toDF()
      .write.mode("append").parquet(src)
    val q1 = EventStreams.ingestStream(spark, src, schema, ckpt, out)
    q1.awaitTermination()
    assert(spark.read.parquet(out).count() == 2)

    // restart with no new data: checkpoint prevents reprocessing
    val q2 = EventStreams.ingestStream(spark, src, schema, ckpt, out)
    q2.awaitTermination()
    assert(spark.read.parquet(out).count() == 2)

    // restart after new files land: only the delta is ingested
    Seq(Ev(3, ts(3), 2, "c", 3.0)).toDF().write.mode("append").parquet(src)
    val q3 = EventStreams.ingestStream(spark, src, schema, ckpt, out)
    q3.awaitTermination()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 3)
    assert(rows.select("event_id").distinct().count() == 3)
  }

  test("update output mode emits revised aggregates as data arrives") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.tumblingAgg(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.outputMode("update")
      .format("memory").queryName("upd_out").start()
    in.addData(Ev(1, ts(1), 1, "click", 1.0))
    q.processAllAvailable()
    in.addData(Ev(2, ts(2), 1, "click", 2.0)) // same window revised upward
    q.processAllAvailable()
    q.stop()
    val ns = spark.table("upd_out").filter(col("event_type") === "click")
      .select("n").collect().map(_.getLong(0)).toSeq
    // update mode re-emits the window: first n=1, then the revision n=2
    assert(ns.sorted == Seq(1L, 2L))
  }

  test("dedupStream drops re-delivered keys within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.dedupStream(in.toDF(), Seq("event_id"), "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    in.addData(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(1), 1, "b", 2.0))
    q.processAllAvailable()
    in.addData(Ev(1, ts(2), 1, "a", 1.0)) // duplicate key re-delivered
    q.processAllAvailable()
    in.addData(Ev(3, ts(3), 1, "c", 3.0))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("event_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
    q.stop()
  }

  test("stream-static enrich joins each micro-batch against the dim broadcast") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[Ev]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = EventStreams.enrich(in.toDF(), dim, Seq("user_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    in.addData(Ev(1, ts(0), 1, "a", 1.0), Ev(2, ts(1), 2, "b", 2.0),
      Ev(3, ts(2), 9, "c", 3.0)) // user 9 has no dim row -> null tier
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enrich_out").select("event_id", "tier")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("gold"), 2L -> Some("basic"), 3L -> None))
  }

  test("stream-stream interval join attributes views to clicks within the window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val c = clicks.toDF().select(col("event_id").as("c_id"), col("user_id").as("c_user"),
      col("ts").as("c_ts"))
    val v = views.toDF().select(col("event_id").as("v_id"), col("user_id").as("v_user"),
      col("ts").as("v_ts"))
    val q = EventStreams.joinWithin(c, v, "c_user", "v_user", "c_ts", "v_ts",
      "10 minutes", "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    views.addData(Ev(100, ts(0), 1, "view", 0), Ev(101, ts(30), 1, "view", 0),
      Ev(102, ts(5), 2, "view", 0))
    clicks.addData(Ev(200, ts(8), 1, "click", 0)) // joins view 100 (0 min) only
    q.processAllAvailable()
    val got = spark.table("ssj_out").select("c_id", "v_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((200L, 100L))) // not 101 (future), not 102 (other user)
    q.stop()
  }

  test("left-outer interval join emits unmatched clicks once watermarks pass") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val views = MemoryStream[Ev]
    val c = clicks.toDF().select(col("event_id").as("c_id"), col("user_id").as("c_user"),
      col("ts").as("c_ts"))
    val v = views.toDF().select(col("event_id").as("v_id"), col("user_id").as("v_user"),
      col("ts").as("v_ts"))
    val q = EventStreams.joinWithin(c, v, "c_user", "v_user", "c_ts", "v_ts",
      "10 minutes", "1 minute", joinType = "left_outer")
      .writeStream.outputMode("append").format("memory").queryName("ssoj_out").start()
    // user 1's click has a view in-window; user 3's click has NO view ever
    views.addData(Ev(100, ts(0), 1, "view", 0))
    clicks.addData(Ev(200, ts(8), 1, "click", 0), Ev(201, ts(8), 3, "click", 0))
    q.processAllAvailable()
    // the unmatched row may NOT be emitted yet: no watermark proof. Advance
    // event time far past the click + interval + watermark on BOTH streams.
    views.addData(Ev(900, ts(40), 9, "view", 0))
    clicks.addData(Ev(901, ts(40), 9, "click", 0))
    q.processAllAvailable()
    // one more batch so the state store evicts against the new watermark
    views.addData(Ev(902, ts(45), 9, "view", 0))
    clicks.addData(Ev(903, ts(45), 9, "click", 0))
    q.processAllAvailable()
    val got = spark.table("ssoj_out").select("c_id", "v_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(got.contains((200L, Some(100L))), got) // matched pair intact
    assert(got.contains((201L, None)), // unmatched click surfaced with nulls
      s"unmatched click not emitted after watermark passed: $got")
    q.stop()
  }

  test("streaming tumbling agg equals the batch twin on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val evs = (0 until 50).map(i =>
      Ev(i.toLong, ts(i % 60), i % 3L, if (i % 2 == 0) "a" else "b", i.toDouble))
    val in = MemoryStream[Ev]
    val q = EventStreams.tumblingAgg(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("parity_out").start()
    in.addData(evs)
    in.addData(Ev(999, Timestamp.valueOf("2024-01-02 00:00:00"), 0, "a", 0.0)) // flush watermark
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("parity_out")
      .select("window_start", "event_type", "n", "sum_value")
    val batch = evs.toDF()
      .groupBy(window(col("ts"), "10 minutes").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming OHLC bars: open/close by event time across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.ohlcAgg(in.toDF(), "10 minutes", "5 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("ohlc_out").start()
    // batch 1 delivers the window's LATER events; batch 2 delivers the
    // earliest one out of order — open must still be the event-time first.
    in.addData(Ev(2, ts(4), 1, "trade", 30.0), Ev(3, ts(7), 1, "trade", 20.0))
    q.processAllAvailable()
    in.addData(Ev(1, ts(1), 1, "trade", 10.0)) // earliest, arrives last
    q.processAllAvailable()
    in.addData(Ev(9, ts(30), 1, "trade", 1.0)) // push watermark; finalize
    q.processAllAvailable()
    q.stop()
    val bars = spark.table("ohlc_out")
      .as[(Timestamp, String, Double, Double, Double, Double, Long)]
      .collect().toSeq
    assert(bars == Seq((Timestamp.valueOf("2024-01-01 10:00:00"), "trade",
      10.0, 30.0, 10.0, 20.0, 3L)), bars)
  }

  test("foreachBatch + mergeRollup maintains the daily rollup incrementally") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    def roll(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
    // standing rollup, folded one micro-batch at a time — raw history is
    // never rescanned, which is the point of Upsert.mergeRollup
    var standing: DataFrame = roll(Seq.empty[Ev].toDF())
    val in = MemoryStream[Ev]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        standing = graft.ingest.Upsert
          .mergeRollup(standing, roll(batch),
            keys = Seq("event_type"), sumCols = Seq("sum_value"), countCols = Seq("n"))
          .localCheckpoint() // cut lineage so plans don't nest per batch
        ()
      }
      .start()
    val evs = Seq(
      Ev(1, ts(1), 1, "click", 1.5), Ev(2, ts(2), 1, "view", 2.5),
      Ev(3, ts(3), 2, "click", 3.0), Ev(4, ts(4), 3, "view", 4.0),
      Ev(5, ts(5), 1, "click", 0.5))
    evs.grouped(2).foreach { g => in.addData(g); q.processAllAvailable() }
    q.stop()
    val got = standing.select("event_type", "n", "sum_value")
      .orderBy("event_type").collect().toSeq
    val want = roll(evs.toDF()).select("event_type", "n", "sum_value")
      .orderBy("event_type").collect().toSeq
    assert(got == want, s"got $got want $want")
  }

  test("scd2Merge: chained incremental merges equal the full-history rebuild") {
    import org.apache.spark.sql.DataFrame
    val b1 = Seq(
      Ev(1, ts(1), 1, "click", 0), Ev(2, ts(2), 1, "view", 0),
      Ev(3, ts(1), 2, "view", 0))
    val b2 = Seq(
      Ev(4, ts(3), 1, "view", 0),  // same attr as user 1's open version → absorbed
      Ev(5, ts(4), 2, "click", 0), // change at the batch boundary
      Ev(6, ts(2), 3, "view", 0))  // new key mid-stream
    val b3 = Seq(
      Ev(7, ts(5), 1, "click", 0),
      Ev(8, ts(5), 1, "view", 0),  // same-ts tie inside a batch (id order)
      Ev(9, ts(6), 3, "view", 0))  // still absorbed
    def sc(df: DataFrame) = graft.ingest.Upsert.scd2(
      df, Seq("user_id"), "ts", "event_id", Seq("event_type"))
    val merged = Seq(b2, b3).foldLeft(sc(b1.toDF())) { (standing, b) =>
      graft.ingest.Upsert.scd2Merge(standing.localCheckpoint(), b.toDF(),
        Seq("user_id"), "ts", "event_id", Seq("event_type"))
    }
    val full = sc((b1 ++ b2 ++ b3).toDF())
    val cols = Seq("user_id", "event_type", "valid_from", "valid_to",
      "version", "is_current")
    val got = merged.select(cols.map(col): _*).orderBy("user_id", "version")
      .collect().toSeq
    val want = full.select(cols.map(col): _*).orderBy("user_id", "version")
      .collect().toSeq
    assert(got == want, s"got\n${got.mkString("\n")}\nwant\n${want.mkString("\n")}")
  }

  test("foreachBatch + scd2Merge maintains the version table incrementally") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    var standing: DataFrame = graft.ingest.Upsert.scd2(
      Seq.empty[Ev].toDF(), Seq("user_id"), "ts", "event_id", Seq("event_type"))
    val in = MemoryStream[Ev]
    val q = in.toDF().writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        standing = graft.ingest.Upsert.scd2Merge(standing, batch,
          Seq("user_id"), "ts", "event_id", Seq("event_type"))
          .localCheckpoint() // cut lineage so plans don't nest per batch
        ()
      }
      .start()
    val evs = Seq(
      Ev(1, ts(1), 1, "click", 0), Ev(2, ts(2), 1, "view", 0),
      Ev(3, ts(3), 2, "view", 0), Ev(4, ts(4), 1, "view", 0),
      Ev(5, ts(5), 2, "click", 0), Ev(6, ts(6), 1, "click", 0))
    evs.grouped(2).foreach { g => in.addData(g); q.processAllAvailable() }
    q.stop()
    val cols = Seq("user_id", "event_type", "valid_from", "valid_to",
      "version", "is_current")
    val got = standing.select(cols.map(col): _*).orderBy("user_id", "version")
      .collect().toSeq
    val want = graft.ingest.Upsert.scd2(evs.toDF(),
      Seq("user_id"), "ts", "event_id", Seq("event_type"))
      .select(cols.map(col): _*).orderBy("user_id", "version").collect().toSeq
    assert(got == want, s"got\n${got.mkString("\n")}\nwant\n${want.mkString("\n")}")
  }
}
