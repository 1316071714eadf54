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

  /** Within-bucket (LOCAL) running sums: adds `_psb` (the range-bucket id)
    * and `<v>_lcum` (inclusive running sum of v within its bucket, ordered
    * by `keyCol`) — the fused-pass building block behind [[runningSums]].
    *
    * A caller that only needs per-bucket AGGREGATES of the global running
    * sums (a global max, a global weighted total — anything that
    * decomposes as f(local, bucket offset)) can `groupBy("_psb")` directly
    * on this frame — the window's hashpartitioning(`_psb`) already
    * satisfies the aggregation, so no second exchange (guide §2.4) — and
    * fold the per-bucket offsets on the DRIVER from the same collected
    * rows: ONE job and ONE pass where the runningSums route costs two jobs
    * (bucket-totals collect, then the offset-joined global pass) plus a
    * broadcast join. Global cum at any row = `<v>_lcum` + its bucket's
    * exclusive offset (Σ of earlier buckets' totals, which the caller has
    * because the per-bucket totals ride the same collect).
    *
    * `keyCol` must be DISTINCT and non-null with values inside `bounds`
    * (callers compute bounds alongside their other scalars); exact integer
    * arithmetic, bit-equal to the one-partition window.
    */
  def localRunningSums(df: DataFrame, keyCol: String, valueCols: Seq[String],
      numBuckets: Int, bounds: (Long, Long)): DataFrame = {
    require(valueCols.nonEmpty, "no value columns")
    require(numBuckets > 0, s"numBuckets ($numBuckets) must be positive")
    val (lo, hi) = bounds
    val width = math.max(1L, (hi - lo) / numBuckets + 1)
    // Column./ is DOUBLE division — DIV keeps the bucket id exact integer
    val bucketed = df.withColumn("_psb",
      expr(s"(CAST(`$keyCol` AS BIGINT) - ${lo}L) DIV ${width}L"))
    val w = Window.partitionBy(col("_psb")).orderBy(col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed.select(
      (col("_psb") +: col(keyCol) +: valueCols.map(col)) ++
        valueCols.map(v => sum(col(v)).over(w).as(s"${v}_lcum")): _*)
  }

  /** Driver-side companion of [[localRunningSums]]: per-bucket EXCLUSIVE
    * offsets from collected (bucketId, per-value totals) rows. Returns the
    * rows sorted by bucket id, each paired with the exclusive prefix of
    * the totals — with the same loud null-key / bounds-coverage checks as
    * [[runningSums]] (a null or out-of-range bucket id means the caller's
    * precondition was violated and the fold would silently misorder).
    */
  def exclusiveOffsets(totals: Seq[(Long, IndexedSeq[Long])],
      numBuckets: Int): Seq[(Long, IndexedSeq[Long], IndexedSeq[Long])] = {
    val sorted = totals.sortBy(_._1)
    sorted.headOption.foreach { h =>
      val (bMin, bMax) = (h._1, sorted.last._1)
      require(bMin >= 0 && bMax < numBuckets,
        s"localRunningSums: bucket ids [$bMin, $bMax] escape [0, $numBuckets)" +
          " — the supplied bounds do not cover the key range")
    }
    val nVals = sorted.headOption.map(_._2.length).getOrElse(0)
    var acc = IndexedSeq.fill(nVals)(0L)
    sorted.map { case (b, tots) =>
      val off = acc
      acc = acc.indices.map(i => acc(i) + tots(i))
      (b, tots, off)
    }
  }

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
