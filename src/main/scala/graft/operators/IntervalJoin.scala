package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** UNKEYED time-proximity join via bin bucketing — the standard trick that
  * turns an otherwise-cartesian range join into an equi-join Spark can
  * shuffle-partition. `left.ts ~ right.ts within tolerance` has no equality
  * predicate, so the naive plan is BroadcastNestedLoop/Cartesian — O(n·m)
  * comparisons and a broadcast of a whole side. Bucketing by
  * `floor(epoch_us / tolerance_us)` gives each RIGHT row one bucket and
  * each LEFT row the 3 buckets any match can live in (tolerance == bucket
  * width ⇒ a match is at most one bucket away); the equi-join on the
  * bucket id then carries the real time predicate as a post-filter.
  *
  * Pairs are emitted exactly once: the right row sits in a single bucket
  * and the left row's 3 probe buckets are distinct, so no dedup pass is
  * needed (a generic wider-than-tolerance bucketing would need one —
  * that's why the bucket width is pinned to the tolerance).
  *
  * Scale (100 TB): one shuffle of each side keyed by bucket; per-bucket
  * work is |L_b|·|R_b| where bucket population is bounded by the event
  * rate within one tolerance window — the join cost tracks the number of
  * TRUE near pairs, not n·m. Hot buckets (event bursts) are ordinary
  * aggregation skew: AQE skew-join splits them like any other key.
  */
object IntervalJoin {

  /** Pairs (leftCols*, rightCols*) with |left.ts − right.ts| ≤ tolerance.
    * Column names must be disjoint across the two sides.
    */
  def binnedTimePairs(left: DataFrame, leftTs: String, right: DataFrame,
      rightTs: String, toleranceUs: Long): DataFrame = {
    require(toleranceUs > 0, s"toleranceUs=$toleranceUs must be positive")
    val lb = left
      .withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_bin", explode(sequence(
        expr(s"(_lus - ${toleranceUs}L) DIV ${toleranceUs}L"),
        expr(s"(_lus + ${toleranceUs}L) DIV ${toleranceUs}L"))))
    val rb = right
      .withColumn("_rus", unix_micros(col(rightTs)))
      .withColumn("_bin", expr(s"_rus DIV ${toleranceUs}L"))
    lb.join(rb, "_bin")
      .filter(abs(col("_lus") - col("_rus")) <= toleranceUs)
      .drop("_bin", "_lus", "_rus")
  }
}
