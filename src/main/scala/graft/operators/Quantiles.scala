package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  def exactQuantile(df: DataFrame, c: String, p: Double): Double =
    exactQuantiles(df, c, Seq(p)).head

  /** All of `ps` in ONE distributed sort pass. Same bit-exact interpolation;
    * returns values in `ps` order. Range-partitioned distributed sort;
    * zipWithIndex assigns global ranks with one extra count pass — no
    * executor holds more than a partition.
    */
  def exactQuantiles(df: DataFrame, c: String, ps: Seq[Double]): Seq[Double] = {
    ps.foreach(p => require(p >= 0.0 && p <= 1.0, s"quantile p=$p out of [0,1]"))
    val vals = df.select(col(c).cast("double")).na.drop
      .rdd.map(_.getDouble(0))
    val n = vals.count()
    require(n > 0, s"exactQuantiles($c): no non-null values")
    val hs = ps.map(p => (n - 1) * p)
    val wanted = hs.flatMap(h =>
      Seq(math.floor(h).toLong, math.ceil(h).toLong)).toSet
    val picked = vals.sortBy(identity).zipWithIndex()
      .filter { case (_, i) => wanted.contains(i) }
      .map { case (v, i) => (i, v) }
      .collect().toMap
    hs.map { h =>
      val lo = math.floor(h).toLong
      val f = h - lo
      picked(lo) * (1 - f) + picked(math.ceil(h).toLong) * f
    }
  }

  /** Equi-DEPTH histogram (p05's value_histogram is equi-WIDTH): `bins`
    * buckets holding ~equal row counts, split at the exact i/bins
    * quantiles. NOT ntile — a global ntile is a single-partition sort. The
    * plan is the scale shape: one range-partitioned boundary sort
    * (exactQuantiles, B-1 cut points collected to the driver) + one narrow
    * fold-the-boundaries-into-a-CASE count scan. Ties at a cut point go to
    * the lower bin (`>` comparisons), so equal values never straddle by
    * arrival order — deterministic where ntile is row-order-dependent.
    * Output per bin: bin (1-based), n, lo/hi = observed min/max inside.
    */
  def equiDepthHistogram(df: DataFrame, valCol: String, bins: Int): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val bounds = exactQuantiles(df, valCol,
      (1 until bins).map(i => i.toDouble / bins))
    val v = col(valCol).cast("double")
    val bin = bounds.map(b => when(v > lit(b), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    df.filter(v.isNotNull)
      .groupBy(bin.cast("int").as("bin"))
      .agg(count(lit(1)).as("n"), min(v).as("lo"), max(v).as("hi"))
  }

  /** DuckDB mirror: quantile_cont cut points (bit-identical to
    * exactQuantiles' interpolation), same `>`-fold bin assignment.
    */
  def equiDepthHistogramSql(table: String, valCol: String, bins: Int): String = {
    val qs = (1 until bins)
      .map(i => s"quantile_cont($valCol, ${i.toDouble / bins}) AS q$i")
      .mkString(", ")
    val binExpr = (1 until bins)
      .map(i => s"(CASE WHEN CAST($valCol AS DOUBLE) > b.q$i THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH b AS (SELECT $qs FROM $table WHERE $valCol IS NOT NULL)
       |SELECT CAST($binExpr + 1 AS INTEGER) AS bin, COUNT(*) AS n,
       |  MIN(CAST($valCol AS DOUBLE)) AS lo, MAX(CAST($valCol AS DOUBLE)) AS hi
       |FROM $table, b WHERE $valCol IS NOT NULL
       |GROUP BY 1""".stripMargin
  }

  /** Exact per-group continuous quantiles without value buffering: shuffle
    * on the group key, SORT within the group (window sort — streams and
    * spills, unlike `percentile`'s in-memory buffer), then pick the two
    * bracketing ranks per requested quantile and interpolate with the same
    * bit-exact formula as `exactQuantile`. One shuffle + one sort total for
    * any number of quantiles. The residual scale bound is one GROUP per
    * sort partition (spillable), not one group's VALUES in one aggregation
    * buffer — the difference between working and OOM on a hot group.
    *
    * Output: groupCol, one double column per (name, p), n (group row count
    * over non-null values).
    */
  def groupedQuantileCont(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    ps.foreach { case (_, p) => require(p >= 0.0 && p <= 1.0, s"p=$p") }
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_v"))
    val wn = Window.partitionBy(col(groupCol))
    val ranked = df.filter(col(valCol).isNotNull)
      .select(col(groupCol), col(valCol).cast("double").as("_v"))
      .withColumn("_rn", row_number().over(w).cast("long") - 1)
      .withColumn("_n", count(lit(1)).over(wn))
    val aggs = ps.flatMap { case (name, p) =>
      val h = (col("_n") - 1).cast("double") * lit(p)
      val f = h - floor(h)
      // lo + hi parts summed in the final agg; when floor(h)==ceil(h) the
      // same row carries the full weight ((1-f)+f with f=0)
      Seq(
        max(when(col("_rn") === floor(h), col("_v") * (lit(1.0) - f))).as(s"_lo_$name"),
        max(when(col("_rn") === ceil(h) && col("_rn") =!= floor(h), col("_v") * f))
          .as(s"_hi_$name"))
    } :+ count(lit(1)).as("n")
    val agged = ranked.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
    ps.foldLeft(agged) { case (d, (name, _)) =>
      d.withColumn(name, col(s"_lo_$name") + coalesce(col(s"_hi_$name"), lit(0.0)))
        .drop(s"_lo_$name", s"_hi_$name")
    }
  }
}
