package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** valueHistogram: p16's mergeable cent-bucket summaries on a stream —
  * counts merge across micro-batches, out-of-range values clamp into the
  * edge bins, and the result equals the batch bucketing of the same rows.
  */
class StreamingHistSpec extends SparkSpec {
  import spark.implicits._

  def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  /** Batch twin: same window, same bucket integers. */
  private def batchHist(rows: Seq[Ev], lo: Long, hi: Long, bins: Int) =
    rows.toDF()
      .select(window(col("ts"), "1 hour").getField("start").as("window_start"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .select(col("window_start"), least(greatest(
        expr(s"((c - ${lo}L) * $bins) DIV (${hi}L - ${lo}L + 1)"),
        lit(0L)), lit((bins - 1).toLong)).as("bin"))
      .groupBy(col("window_start"), col("bin"))
      .agg(count(lit(1)).as("n"))

  test("stream equals batch bucketing; micro-batch counts merge; edges clamp") {
    implicit val sqlCtx = spark.sqlContext
    val (lo, hi, bins) = (100L, 1099L, 10L) // cents 100..1099, width ~100
    val in = MemoryStream[Ev]
    val q = EventStreams.valueHistogram(in.toDF(), "1 hour", "30 minutes",
        lo, hi, bins.toInt)
      .writeStream.outputMode("append")
      .format("memory").queryName("hist_out").start()
    // batch 1 and batch 2 both hit bin 0 — the counts must MERGE, and
    // values below lo / above hi clamp to bins 0 / 9
    val b1 = Seq(
      Ev(1, ts(1), 1, "c", 1.00), Ev(2, ts(2), 2, "c", 1.50), // bin 0
      Ev(3, ts(3), 3, "c", 0.10),                             // < lo → bin 0
      Ev(4, ts(4), 4, "c", 5.55))                             // bin 4
    val b2 = Seq(
      Ev(5, ts(5), 5, "c", 1.99),                             // bin 0 again
      Ev(6, ts(6), 6, "c", 99.99))                            // > hi → bin 9
    in.addData(b1: _*)
    q.processAllAvailable()
    in.addData(b2: _*)
    q.processAllAvailable()
    in.addData(Ev(9, Timestamp.valueOf("2024-01-01 12:00:00"), 9, "c", 1.0))
    q.processAllAvailable()
    val got = spark.table("hist_out")
      .filter(col("window_start") === lit(ts(0)))
      .as[(Timestamp, Long, Long)].collect().toSet
    val exp = batchHist(b1 ++ b2, lo, hi, bins.toInt)
      .filter(col("window_start") === lit(ts(0)))
      .as[(Timestamp, Long, Long)].collect().toSet
    assert(got == exp, s"stream=$got batch=$exp")
    assert(got.exists(r => r._2 == 0L && r._3 == 4L), got) // merged bin 0
    assert(got.exists(r => r._2 == 9L && r._3 == 1L), got) // clamped high
    q.stop()
  }
}
