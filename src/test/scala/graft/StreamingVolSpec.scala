package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** volatilityAgg: s23's exact integer moments on a stream — n/Σx/Σx² merge
  * across micro-batches by addition, the emitted vol equals the batch
  * computation of the same rows bit-for-bit, and single-event windows emit
  * a null vol (sample variance undefined).
  */
class StreamingVolSpec extends SparkSpec {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private def batchMoments(rows: Seq[Ev]) =
    rows.toDF()
      .select(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy(col("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sx"),
        sum(col("c") * col("c")).as("sxx"))

  test("stream vol equals batch moments merged across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.volatilityAgg(in.toDF(), "1 hour", "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("vol_out").start()
    val b1 = Seq(
      Ev(1, ts(1), 1, "c", 4.00), Ev(2, ts(2), 2, "c", 8.00),
      Ev(3, ts(3), 3, "p", 5.00)) // singleton type in this window
    val b2 = Seq(
      Ev(4, ts(4), 4, "c", 2.00), Ev(5, ts(5), 5, "c", 10.00))
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    // advance the watermark past the 10:00 window so append emits it
    in.addData(Ev(9, Timestamp.valueOf("2024-01-01 12:00:00"), 9, "c", 1.0))
    q.processAllAvailable()
    val got = spark.table("vol_out")
      .filter(col("window_start") === lit(ts(0)))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getDouble(5))))
      .toSet
    val exp = batchMoments(b1 ++ b2)
      .filter(col("window_start") === lit(ts(0)))
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    // the merged moments equal the batch run over all rows
    assert(got.map(t => (t._1, t._2, t._3, t._4)) == exp,
      s"stream=$got batch=$exp")
    // "c": cents 400,800,200,1000 → n=4, brute-force sample stddev / 100
    val cs = Seq(400.0, 800.0, 200.0, 1000.0)
    val mean = cs.sum / cs.size
    val brute =
      math.sqrt(cs.map(x => (x - mean) * (x - mean)).sum / (cs.size - 1)) / 100.0
    val cVol = got.find(_._1 == "c").get._5.get
    assert(math.abs(cVol - brute) < 1e-9, s"$cVol vs $brute")
    // the singleton "p" window emits with a NULL vol
    assert(got.find(_._1 == "p").get._5.isEmpty)
    q.stop()
  }
}
