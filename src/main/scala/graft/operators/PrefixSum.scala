package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix (running) sums over a GLOBAL key ordering without
  * ever moving the data to one partition — the scalable replacement for
  * `Window.orderBy(k)` with no partitionBy, whose single-partition sort is
  * the classic cluster-killer (Spark itself warns on it).
  *
  * Standard two-level scan: (1) range-bucket each row by the key using
  * fixed-width integer ranges from a 1-row min/max pull; (2) per-bucket
  * partial sums — ≤ `numBuckets` rows — are prefix-folded on the DRIVER
  * (a bounded collect, the KMeans-centroids contract) into exclusive
  * bucket offsets; (3) a broadcast join hands each bucket its offset and
  * a WITHIN-bucket window (partitioned by bucket, so every bucket sorts
  * in parallel) adds the local running sum. All arithmetic is exact
  * integer; results are bit-equal to the one-partition window.
  *
  * Skewed keys concentrate rows in few ranges (same failure mode as any
  * range partitioning); for value-skewed domains feed ntile-style
  * quantile boundaries instead of fixed widths — the two-level shape is
  * unchanged.
  */
object PrefixSum {

  /** Adds `<v>_cum` (inclusive running sum ordered by `keyCol`) for every
    * column in `valueCols` to a frame whose `keyCol` values are DISTINCT
    * (pre-aggregate first — a running sum over duplicate keys has no
    * well-defined per-row value).
    */
  def runningSums(df: DataFrame, keyCol: String, valueCols: Seq[String],
      numBuckets: Int = 256, bounds: Option[(Long, Long)] = None): DataFrame = {
    require(valueCols.nonEmpty, "no value columns")
    require(numBuckets > 0, s"numBuckets ($numBuckets) must be positive")
    // callers that already know (or compute alongside other scalars) the
    // key range pass it in — saves one driver job on the shared relation
    val (lo, hi) = bounds.getOrElse {
      val mm = df.agg(min(col(keyCol)).cast("long").as("lo"),
        max(col(keyCol)).cast("long").as("hi")).collect()(0)
      if (mm.isNullAt(0)) return df.select(
        (col(keyCol) +: valueCols.map(col)) ++
          valueCols.map(v => col(v).as(s"${v}_cum")): _*) // empty frame
      (mm.getLong(0), mm.getLong(1))
    }
    val width = math.max(1L, (hi - lo) / numBuckets + 1)
    // Column./ is DOUBLE division — DIV keeps the bucket id exact integer
    val bucketed = df.withColumn("_psb",
      expr(s"(CAST(`$keyCol` AS BIGINT) - ${lo}L) DIV ${width}L"))
    // per-bucket totals: ≤ numBuckets rows to the driver, exclusive prefix
    val aggCols = valueCols.map(v => sum(col(v)).as(v))
    val totals = bucketed.groupBy(col("_psb"))
      .agg(aggCols.head, aggCols.tail: _*)
      .collect().toVector.map { r =>
        // a null bucket id means null keys reached the primitive: the rows
        // would drop out of the inner offset join while Row.getLong's 0L
        // unboxing duplicated bucket 0 — corrupt output, so fail loudly
        // (running sums over null keys have no defined position anyway)
        require(!r.isNullAt(0),
          s"runningSums: keyCol `$keyCol` contains NULLs — filter or " +
            "pre-aggregate them out; a null key has no prefix-order position")
        r.getLong(0) -> valueCols.indices.map(i => r.getLong(i + 1))
      }.sortBy(_._1)
    // caller-supplied bounds are a precondition, not a hint: a key below lo
    // truncates into the wrong (or negative) bucket and the offset fold
    // silently misorders. The collected ids are ≤ numBuckets rows, so the
    // check is free.
    totals.headOption.foreach { _ =>
      val (bMin, bMax) = (totals.head._1, totals.last._1)
      require(bMin >= 0 && bMax < numBuckets,
        s"runningSums: bucket ids [$bMin, $bMax] escape [0, $numBuckets) — " +
          s"the supplied bounds ($lo, $hi) do not cover keyCol `$keyCol`")
    }
    val offsets = totals.scanLeft((-1L, valueCols.map(_ => 0L).toIndexedSeq)) {
      case ((_, acc), (b, sums)) => (b, acc.indices.map(i => acc(i) + sums(i)))
    }.sliding(2).collect { case Seq((_, acc), (b, _)) => (b, acc) }.toSeq
    val offDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(offsets.map { case (b, acc) =>
        org.apache.spark.sql.Row.fromSeq(b +: acc) }: _*),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("_psb",
          org.apache.spark.sql.types.LongType, nullable = false) +:
        valueCols.map(v => org.apache.spark.sql.types.StructField(
          s"_off_$v", org.apache.spark.sql.types.LongType, nullable = false))))
    // within-bucket running sum, every bucket in parallel
    val w = Window.partitionBy(col("_psb")).orderBy(col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.join(broadcast(offDf), Seq("_psb"))
      .select((col(keyCol) +: valueCols.map(col)) ++ valueCols.map(v =>
        (sum(col(v)).over(w) + col(s"_off_$v")).as(s"${v}_cum")): _*)
  }
}
