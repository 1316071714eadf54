package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact quantiles without value-buffering aggregates.
  *
  * Spark's built-in `percentile` is a TypedImperativeAggregate that buffers
  * every value of the group in one aggregation buffer — exact, but a
  * driver/executor-memory scale-killer for whole-table quantiles at 100 TB.
  * `exactQuantile` computes the same continuous-interpolation quantile
  * (DuckDB `quantile_cont` semantics, bit-identical result) fully
  * distributed: a range-partitioned sort of the single column plus a rank
  * lookup — every stage is a shuffle-and-stream, nothing is buffered.
  *
  * Cost: one sort shuffle of the (projected, non-null) column + two light
  * passes (count, rank extraction). Use `approx_percentile` when a rank
  * error of n/accuracy is acceptable; use this when the answer must be
  * exact (e.g. the oracle-checked quality gate).
  */
object Quantiles {

  /** Exact continuous-interpolation quantile of a numeric column.
    *
    * Interpolation matches Spark's `percentile` and DuckDB's `quantile_cont`
    * bit-for-bit: with h = (n-1)*p and f = h - floor(h), result =
    * v[floor(h)] * (1-f) + v[ceil(h)] * f. (The algebraically-equal
    * v_lo + (v_hi - v_lo) * f rounds differently — an ulp off both engines.)
    */
  def exactQuantile(df: DataFrame, c: String, p: Double): Double = {
    require(p >= 0.0 && p <= 1.0, s"quantile p=$p out of [0,1]")
    val vals = df.select(col(c).cast("double")).na.drop
      .rdd.map(_.getDouble(0))
    val n = vals.count()
    require(n > 0, s"exactQuantile($c): no non-null values")
    val h = (n - 1) * p
    val lo = math.floor(h).toLong
    val hi = math.ceil(h).toLong
    // Range-partitioned distributed sort; zipWithIndex assigns global ranks
    // with one extra count pass. No executor holds more than a partition.
    val ranked = vals.sortBy(identity).zipWithIndex()
    val picked = ranked
      .filter { case (_, i) => i == lo || i == hi }
      .map { case (v, i) => (i, v) }
      .collect().toMap
    val vLo = picked(lo)
    val vHi = picked(hi)
    val f = h - lo
    vLo * (1 - f) + vHi * f
  }
}
