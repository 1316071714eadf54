package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** STREAMING twin of the unkeyed time-proximity join (`operators/
  * IntervalJoin.binnedTimePairs`, s25): `|left.ts − right.ts| ≤ tolerance`
  * between two STREAMS.
  *
  * Structured Streaming refuses a stream-stream join without an equality
  * predicate — the symmetric hash join needs a key to route state — so the
  * naive range-only form is not merely slow here, it is unplannable. The
  * batch operator's bucketing trick is exactly what makes the streaming
  * form legal: bin each side by `floor(epoch_us / tolerance_us)` (right
  * rows take their one home bucket, left rows expand to the 3 buckets any
  * match can live in), join on BUCKET EQUALITY, and carry the true time
  * predicate as the interval condition. Pairs emit exactly once for the
  * same reason as the batch twin: one home bucket × 3 distinct probe
  * buckets.
  *
  * State stays bounded on BOTH axes: the bucket key routes state like any
  * stream-stream join key, and the event-time interval condition on the
  * two WATERMARKED timestamp columns gives the engine the eviction bound —
  * a buffered row is dropped as soon as the other side's watermark passes
  * its timestamp + tolerance (the same contract `EventStreams.joinWithin`
  * documents for the keyed case). Steady-state size per side ≈ event rate
  * × (watermark delay + tolerance), independent of stream length.
  *
  * Scale: identical join shape to the batch operator — per-bucket work is
  * |L_b|·|R_b| with bucket population bounded by the event rate within one
  * tolerance window; burst buckets are the planted-skew scenario
  * IntervalJoinSpec/SkewBench measure (micro-batch state routing shares
  * the same partitioning story).
  */
object StreamingIntervalJoin {

  /** Pairs (leftCols*, rightCols*) with |left.ts − right.ts| ≤ tolerance,
    * both inputs streaming. Column names must be disjoint across sides;
    * `delay` is the shared watermark (late-data bound) on both timestamp
    * columns. Emits in Append mode (inner join).
    */
  def binnedTimePairsStream(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, toleranceUs: Long,
      delay: String): DataFrame = {
    require(toleranceUs > 0, s"toleranceUs=$toleranceUs must be positive")
    val lb = left.withWatermark(leftTs, delay)
      .withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_bin", explode(sequence(
        expr(s"(_lus - ${toleranceUs}L) DIV ${toleranceUs}L"),
        expr(s"(_lus + ${toleranceUs}L) DIV ${toleranceUs}L"))))
    val rb = right.withWatermark(rightTs, delay)
      .withColumn("_rus", unix_micros(col(rightTs)))
      .withColumn("_rbin", expr(s"_rus DIV ${toleranceUs}L"))
    lb.join(rb,
        col("_bin") === col("_rbin") &&
          // the eviction bound: an interval condition on the two
          // watermarked EVENT-TIME columns (not the derived epoch longs) is
          // what lets the engine age state out
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL '$toleranceUs' MICROSECOND") &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL '$toleranceUs' MICROSECOND"),
        "inner")
      .drop("_bin", "_rbin", "_lus", "_rus")
  }

  /** LEFT OUTER form: every left row emits — matched against each right
    * row within tolerance, or ONCE null-padded after the right watermark
    * passes `leftTs + tolerance` (the point where no matching right row
    * can still legally arrive). The keyed twin (`EventStreams.joinWithin`)
    * proves the same unmatched-at-watermark contract; this is the unkeyed
    * time-proximity version.
    *
    * The bucket construction FLIPS relative to the inner form: the LEFT
    * side keeps its single home bucket and the RIGHT side explodes to the
    * 3 buckets a match can live in. With the left exploded (the inner
    * form's layout) an unmatched left row would surface as 3 null-padded
    * state evictions — one per bucket copy — and the join would emit
    * triplicate unmatched rows. Left-at-home keeps both guarantees:
    * matched pairs still meet exactly once (the right expansion covers the
    * left's home bucket exactly once), and an unmatched left row has
    * exactly one buffered copy to null-pad. State cost is identical (one
    * side explodes 3× either way).
    */
  def binnedTimePairsStreamLeftOuter(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, toleranceUs: Long,
      delay: String): DataFrame = {
    require(toleranceUs > 0, s"toleranceUs=$toleranceUs must be positive")
    val lb = left.withWatermark(leftTs, delay)
      .withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_bin", expr(s"_lus DIV ${toleranceUs}L"))
    val rb = right.withWatermark(rightTs, delay)
      .withColumn("_rus", unix_micros(col(rightTs)))
      .withColumn("_rbin", explode(sequence(
        expr(s"(_rus - ${toleranceUs}L) DIV ${toleranceUs}L"),
        expr(s"(_rus + ${toleranceUs}L) DIV ${toleranceUs}L"))))
    lb.join(rb,
        col("_bin") === col("_rbin") &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL '$toleranceUs' MICROSECOND") &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL '$toleranceUs' MICROSECOND"),
        "left_outer")
      .drop("_bin", "_rbin", "_lus", "_rus")
  }
}
