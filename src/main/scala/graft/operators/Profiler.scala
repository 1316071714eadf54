package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Column-level data profiling — the ANALYZE-TABLE shape every ingestion
  * pipeline runs before trusting a new drop: per-column row/null/distinct
  * counts plus min/max (numeric columns as exact doubles, string columns
  * as strings — kept in separate output columns so no engine-dependent
  * number formatting enters the hash).
  *
  * Scale: ONE pass — a single global aggregation computes every column's
  * stats together (count/min/max partial-aggregate map-side), then the
  * 1-row result explodes into one row per column. No per-column scans.
  * Distinct counts: exact `count(DISTINCT)` Expands the input once per
  * profiled column before the shuffle — correct, and the oracle anchor
  * (p01), but c columns × n rows of Expand output is the wrong trade at
  * 100 TB. `approx = true` swaps in `approx_count_distinct` (HLL++):
  * constant-size sketches, NO Expand, genuinely one map-side-combined
  * aggregation — the ANALYZE mode for a real drop, spec-checked against
  * the exact twin within HLL tolerance (like q24's estimator).
  */
object Profiler {

  /** numericCols/stringCols: columns to profile, by type. Output:
    * (column, n, n_null, n_distinct, min_num, max_num, min_str, max_str).
    */
  def profile(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String], approx: Boolean = false): DataFrame = {
    def nd(c: String) =
      if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))
    val aggs = (numericCols ++ stringCols).flatMap { c =>
      Seq(count(col(c)).as(s"_cnt_$c"),
        nd(c).as(s"_nd_$c"),
        min(col(c)).as(s"_min_$c"),
        max(col(c)).as(s"_max_$c"))
    }
    val one = df.agg(count(lit(1)).as("_n"), aggs: _*)
    val rows = numericCols.map { c =>
      struct(lit(c).as("column"), col("_n").as("n"),
        (col("_n") - col(s"_cnt_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        col(s"_min_$c").cast("double").as("min_num"),
        col(s"_max_$c").cast("double").as("max_num"),
        lit(null).cast("string").as("min_str"),
        lit(null).cast("string").as("max_str"))
    } ++ stringCols.map { c =>
      struct(lit(c).as("column"), col("_n").as("n"),
        (col("_n") - col(s"_cnt_$c")).as("n_null"),
        col(s"_nd_$c").as("n_distinct"),
        lit(null).cast("double").as("min_num"),
        lit(null).cast("double").as("max_num"),
        col(s"_min_$c").cast("string").as("min_str"),
        col(s"_max_$c").cast("string").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Distribution-drift detector between a reference and a current slice
    * of the same numeric column: 10 equal-width buckets pinned to the
    * REFERENCE's [min, max] (exact BIGINT cent arithmetic — p05's edge
    * formula — with out-of-range current values clamped into the edge
    * buckets), per-bucket counts and shares, and the chi-square
    * contribution (q−p)²/p on add-one-smoothed shares. Chi-square instead
    * of PSI on purpose: +,−,×,÷ are IEEE-correctly-rounded and therefore
    * engine-portable, while ln() is not guaranteed bit-identical across
    * engines. Emitting per-bucket terms (not their sum) keeps the result
    * order-independent; the consumer sums 10 rows.
    *
    * Scale notes: reference bounds are a 1-row broadcast; each side is one
    * scan + one 10-row aggregation; the final join is 10×10 rows. This is
    * the weekly snapshot-vs-snapshot data-quality gate at any corpus size.
    */
  /** Pairwise Pearson correlation MATRIX over `cols` in ONE aggregation
    * pass: every per-column sum and every pairwise cross sum ride the same
    * global aggregate (map-side combined — the scan cost is one pass
    * regardless of how many pairs), then the 1-row result explodes into
    * (col_a, col_b, corr, n) rows.
    *
    * Numerics: values are 2-dp-exact domain quantities (prices/rates), so
    * each is carried as integer CENTS (decimal(9,2)·100 → long) and every
    * co-moment is an exact LONG sum — the primitive codegen fast path.
    * Products of two cent values reach ~1e18, so each product sum is
    * SPLIT (hi = p div 1e9, lo = p mod 1e9, mathematical mod) into two
    * long sums recombined in double; both engines evaluate the identical
    * expression tree, so results are bit-identical (built-in `corr` is
    * summation-order-dependent and engine-specific).
    *
    * This replaced the round-6 DECIMAL(38,0) split sums: 28 wide-decimal
    * aggregation buffers allocate a BigDecimal per row per term, and the
    * resulting GC pressure made p14 super-linear (sf1 7.2 s → sf3 26.1 s
    * isolated). Long sums keep the whole update loop primitive.
    *
    * IN-RANGE REGIME, guarded LOUDLY: the long sums are exact while
    * n·1e9 < 2^62 and n·max|cents_i|·max|cents_j|/1e9 < 2^62 — i.e. up to
    * ~4.6e9 rows at any decimal(9,2) magnitude (and far more for small
    * magnitudes). The per-column max-abs rides the same aggregate and the
    * final projection raise_errors when the bound is at risk instead of
    * wrapping silently. Past that regime, shard the input (e.g. union of
    * per-month matrices via [[mergeableQuantiles]]-style partial merge)
    * or widen the split modulus.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val M = 1000000000L
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (i, j)
    // squares ride the same split-product path as cross terms
    val prods = cols.indices.map(i => (i, i)) ++ pairs
    // pre-project the cents ONCE (aggregate children are not CSE'd across
    // functions); the decimal cast+scale is exact for 2-dp domain values
    val base = df.select(cols.zipWithIndex.map { case (c, i) =>
      (col(c).cast("decimal(9,2)") * 100).cast("long").as(s"_c$i") }: _*)
    def hiLo(i: Int, j: Int): Seq[Column] = {
      val p = s"(_c$i * _c$j)"
      val lo = s"((($p % ${M}L) + ${M}L) % ${M}L)"
      Seq(expr(s"(($p - $lo) DIV ${M}L)").as(s"x${i}_${j}hi"),
        expr(lo).as(s"x${i}_${j}lo"))
    }
    val projected = base.select(
      cols.indices.map(i => col(s"_c$i")) ++
        prods.flatMap { case (i, j) => hiLo(i, j) }: _*)
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.indices.map(i => sum(col(s"_c$i")).as(s"s$i")) ++
      cols.indices.map(i => max(abs(col(s"_c$i"))).as(s"m$i")) ++
      prods.flatMap { case (i, j) => Seq(
        sum(col(s"x${i}_${j}hi")).as(s"x${i}_${j}hi"),
        sum(col(s"x${i}_${j}lo")).as(s"x${i}_${j}lo")) }
    val sums = projected.agg(aggs.head, aggs.tail: _*)
    val nd = col("n").cast("double")
    def pd(i: Int, j: Int) =
      col(s"x${i}_${j}hi").cast("double") * lit(1e9) +
        col(s"x${i}_${j}lo").cast("double")
    def sd(i: Int) = col(s"s$i").cast("double")
    def md(i: Int) = col(s"m$i").cast("double")
    // loud overflow guard (double-space checks, headroom at 2^62): plain
    // cent sums, the lo sums (< 1e9/row), and the hi sums (≤ mi·mj/1e9 + 1
    // per row) must all stay clear of long range
    val headroom = lit(4.6e18)
    val guard = (
      cols.indices.map(i => nd * md(i) > headroom) ++
        Seq(nd * lit(1e9) > headroom) ++
        prods.map { case (i, j) => nd * (md(i) * md(j) / lit(1e9) + lit(1.0)) > headroom }
      ).reduce(_ || _)
    val rows = pairs.map { case (i, j) =>
      val corr = (nd * pd(i, j) - sd(i) * sd(j)) /
        (sqrt(nd * pd(i, i) - sd(i) * sd(i)) *
          sqrt(nd * pd(j, j) - sd(j) * sd(j)))
      struct(lit(cols(i)).as("col_a"), lit(cols(j)).as("col_b"),
        when(guard, raise_error(lit("correlationMatrix: cent split-sums " +
          "out of the exact-long regime (n or magnitudes too large) — " +
          "shard the input or widen the split modulus")).cast("double"))
          .otherwise(corr).as("corr"),
        col("n").as("n"))
    }
    sums.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** DuckDB mirror of [[correlationMatrix]] (same cent quantization, same
    * hi/lo split products, same recombination order, one UNION ALL arm per
    * pair over the 1-row CTE). SUM(BIGINT) promotes to HUGEINT in DuckDB —
    * cast back to BIGINT (exact in the guarded regime) before the double
    * recombination so both engines convert the same integer.
    */
  def correlationMatrixSql(table: String, cols: Seq[String]): String = {
    val M = "CAST(1000000000 AS BIGINT)"
    def cents(c: String) = s"CAST(CAST($c AS DECIMAL(9,2)) * 100 AS BIGINT)"
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (i, j)
    val prods = cols.indices.map(i => (i, i)) ++ pairs
    def prod(i: Int, j: Int) = s"(${cents(cols(i))} * ${cents(cols(j))})"
    def lo(i: Int, j: Int) = s"(((${prod(i, j)} % $M) + $M) % $M)"
    val aggs = Seq("COUNT(*) AS n") ++
      cols.zipWithIndex.map { case (c, i) =>
        s"CAST(SUM(${cents(c)}) AS BIGINT) AS s$i" } ++
      prods.flatMap { case (i, j) => Seq(
        s"CAST(SUM((${prod(i, j)} - ${lo(i, j)}) // $M) AS BIGINT) AS x${i}_${j}hi",
        s"CAST(SUM(${lo(i, j)}) AS BIGINT) AS x${i}_${j}lo") }
    def pd(i: Int, j: Int) =
      s"(CAST(x${i}_${j}hi AS DOUBLE) * 1000000000.0 + CAST(x${i}_${j}lo AS DOUBLE))"
    def sd(i: Int) = s"CAST(s$i AS DOUBLE)"
    val nd = "CAST(n AS DOUBLE)"
    val arms = pairs.map { case (i, j) =>
      val (sx, sy, sxy) = (sd(i), sd(j), pd(i, j))
      val (sx2, sy2) = (pd(i, i), pd(j, j))
      s"""SELECT '${cols(i)}' AS col_a, '${cols(j)}' AS col_b,
         |  ($nd * $sxy - $sx * $sy) /
         |    (sqrt($nd * $sx2 - $sx * $sx) * sqrt($nd * $sy2 - $sy * $sy)) AS corr,
         |  n FROM sums""".stripMargin
    }
    // MATERIALIZED: every UNION ALL arm references the CTE; inlined it
    // would rescan+reaggregate the table once per pair arm
    s"""WITH sums AS MATERIALIZED (SELECT ${aggs.mkString(", ")} FROM $table)
       |${arms.mkString("\nUNION ALL ")}""".stripMargin
  }

  def distDrift(ref: DataFrame, cur: DataFrame, valueCol: String): DataFrame = {
    def cents(df: DataFrame) = df.select(
      (col(valueCol).cast("decimal(18,2)") * 100).cast("long").as("c"))
    val bounds = cents(ref).agg(min(col("c")).as("minc"), max(col("c")).as("maxc"))
    def bucketed(df: DataFrame, name: String) = cents(df)
      .crossJoin(broadcast(bounds))
      .select(least(greatest(
        expr("((c - minc) * 10) DIV (maxc - minc + 1)"), lit(0L)), lit(9L))
        .as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as(name))
    val r = bucketed(ref, "ref_n")
    val q = bucketed(cur, "cur_n")
    val allBuckets = ref.sparkSession.range(0, 10).select(col("id").as("bucket"))
    // totals come from window sums over the 10-row joined frame — the
    // clamp guarantees every row landed in a bucket, so no extra scan or
    // driver count is needed
    val wAll = Window.partitionBy()
    val p = (col("ref_n") + 1L).cast("double") /
      (sum(col("ref_n")).over(wAll) + 10L).cast("double")
    val qq = (col("cur_n") + 1L).cast("double") /
      (sum(col("cur_n")).over(wAll) + 10L).cast("double")
    allBuckets
      .join(r, Seq("bucket"), "left").join(q, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
      .select(col("bucket"), col("ref_n"), col("cur_n"),
        p.as("ref_share"), qq.as("cur_share"),
        ((qq - p) * (qq - p) / p).as("chi2_term"))
  }

  /** DuckDB twin of `distDrift`: `refPred` selects the reference slice of
    * `table`, its negation the current slice.
    */
  def distDriftSql(table: String, valueCol: String, refPred: String): String =
    s"""WITH refc AS (
       |  SELECT CAST(CAST($valueCol AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
       |  FROM $table WHERE $refPred),
       |curc AS (
       |  SELECT CAST(CAST($valueCol AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
       |  FROM $table WHERE NOT ($refPred)),
       |bounds AS (SELECT MIN(c) AS minc, MAX(c) AS maxc FROM refc),
       |rb AS (
       |  SELECT LEAST(GREATEST(((c - minc) * 10) // (maxc - minc + 1), 0), 9)
       |    AS bucket, COUNT(*) AS ref_n
       |  FROM refc CROSS JOIN bounds GROUP BY 1),
       |cb AS (
       |  SELECT LEAST(GREATEST(((c - minc) * 10) // (maxc - minc + 1), 0), 9)
       |    AS bucket, COUNT(*) AS cur_n
       |  FROM curc CROSS JOIN bounds GROUP BY 1),
       |tot AS (SELECT (SELECT COUNT(*) FROM refc) AS rt,
       |               (SELECT COUNT(*) FROM curc) AS ct),
       |b AS (SELECT unnest(range(0, 10)) AS bucket)
       |SELECT b.bucket,
       |  COALESCE(rb.ref_n, 0) AS ref_n, COALESCE(cb.cur_n, 0) AS cur_n,
       |  CAST(COALESCE(rb.ref_n, 0) + 1 AS DOUBLE) / CAST(t.rt + 10 AS DOUBLE)
       |    AS ref_share,
       |  CAST(COALESCE(cb.cur_n, 0) + 1 AS DOUBLE) / CAST(t.ct + 10 AS DOUBLE)
       |    AS cur_share,
       |  (CAST(COALESCE(cb.cur_n, 0) + 1 AS DOUBLE) / CAST(t.ct + 10 AS DOUBLE)
       |    - CAST(COALESCE(rb.ref_n, 0) + 1 AS DOUBLE) / CAST(t.rt + 10 AS DOUBLE))
       |  * (CAST(COALESCE(cb.cur_n, 0) + 1 AS DOUBLE) / CAST(t.ct + 10 AS DOUBLE)
       |    - CAST(COALESCE(rb.ref_n, 0) + 1 AS DOUBLE) / CAST(t.rt + 10 AS DOUBLE))
       |  / (CAST(COALESCE(rb.ref_n, 0) + 1 AS DOUBLE) / CAST(t.rt + 10 AS DOUBLE))
       |    AS chi2_term
       |FROM b LEFT JOIN rb ON b.bucket = rb.bucket
       |       LEFT JOIN cb ON b.bucket = cb.bucket
       |       CROSS JOIN tot t""".stripMargin

  /** Incremental (mergeable) profiling — the stats-maintenance shape for a
    * partitioned 100 TB table: each partition contributes one SUMMARY row
    * (count, min, max, and a bottom-k KMV heap of the key column's
    * distinct hashes); summaries persist per ingest batch and a stats
    * refresh merges them WITHOUT rescanning history. Exact for count/min/
    * max; the distinct estimate is the q24 KMV estimator, and per-part
    * heaps merge losslessly (bottom-k of a union = bottom-k of the union
    * of bottom-ks) — so the merged estimate is IDENTICAL to profiling the
    * whole table directly, which is what the oracle replays.
    *
    * Summary relation: (part, n, min_v, max_v, kmv: array<long> ascending).
    */
  def incrementalSummaries(df: DataFrame, partCol: Column, numCol: String,
      keyCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val stats = df.groupBy(partCol.cast("string").as("part"))
      .agg(count(lit(1)).as("n"),
        min(col(numCol)).as("min_v"), max(col(numCol)).as("max_v"))
    // dedup raw (part, key) first (cheap hash-agg), then hash — same hash
    // set as hashing every row, a fraction of the md5 work (q24's trick)
    val hashed = df.select(partCol.cast("string").as("part"), col(keyCol))
      .distinct()
      .select(col("part"),
        graft.functions.TextFns.md5Hash32(col(keyCol).cast("string")).as("h"))
      .distinct()
      .as[(String, Long)]
    val kmv = hashed.groupByKey(_._1).mapValues(_._2)
      .agg(new BottomKHeap(k).toColumn.name("kmv"))
      .toDF("part", "kmv")
    stats.join(kmv, Seq("part"))
  }

  /** Merge a summary relation into one profile row: (n_rows, n_parts,
    * min_v, max_v, est_distinct). The distinct estimate re-runs the
    * bottom-k sketch over the UNION of the per-part heaps (|parts|×k
    * values — summary-sized, nothing touches raw data).
    */
  def mergeSummaries(summ: DataFrame, k: Int): DataFrame = {
    val spark = summ.sparkSession
    import spark.implicits._
    val base = summ.agg(
      sum(col("n")).cast("long").as("n_rows"),
      count(lit(1)).cast("long").as("n_parts"),
      min(col("min_v")).cast("double").as("min_v"),
      max(col("max_v")).cast("double").as("max_v"))
    // a typed select of a tuple-output Aggregator flattens to _1/_2
    val merged = summ.select(explode(col("kmv")).as("h")).distinct()
      .as[Long]
      .select(new BottomKSketch(k).toColumn.name("kmv"))
      .select(col("_1").as("cnt"), col("_2").as("kth"))
    base.crossJoin(merged).select(
      col("n_rows"), col("n_parts"), col("min_v"), col("max_v"),
      Kmv.estimate(k, col("cnt"), col("kth")).as("est_distinct"))
  }

  /** DuckDB mirror of incrementalSummaries+mergeSummaries: the merged
    * result equals profiling the whole table directly (mergeability), so
    * the oracle computes the direct form.
    */
  def incrementalProfileSql(table: String, partExpr: String, numCol: String,
      keyCol: String, k: Int): String =
    s"""WITH hashed AS (
       |  SELECT DISTINCT ${graft.functions.TextFns.md5Hash32Sql(
             s"CAST($keyCol AS VARCHAR)")} AS h
       |  FROM $table),
       |cnt AS (SELECT COUNT(*) AS n_h FROM hashed),
       |kth AS (
       |  SELECT h AS kth FROM (
       |    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hashed)
       |  WHERE rn = $k),
       |base AS (
       |  SELECT COUNT(*) AS n_rows, COUNT(DISTINCT $partExpr) AS n_parts,
       |    CAST(MIN($numCol) AS DOUBLE) AS min_v,
       |    CAST(MAX($numCol) AS DOUBLE) AS max_v
       |  FROM $table)
       |SELECT CAST(n_rows AS BIGINT) AS n_rows, CAST(n_parts AS BIGINT) AS n_parts,
       |  min_v, max_v,
       |  CASE WHEN kth IS NULL THEN CAST(n_h AS DOUBLE)
       |       ELSE CAST(${k - 1} AS DOUBLE) / (CAST(kth AS DOUBLE) / 4294967296.0)
       |  END AS est_distinct
       |FROM base CROSS JOIN cnt LEFT JOIN kth ON TRUE""".stripMargin

  /** MERGEABLE quantile summaries — the piece p11's incremental profile
    * can't get from count/min/max/KMV: per-partition fixed-bin histograms
    * over exact cent buckets (p05/p09's bucket idiom). Bin counts merge by
    * addition, so a stats refresh folds new partition summaries in without
    * rescanning history, and [[histQuantiles]] reads any percentile off
    * the merged counts with error bounded by one bin width. The honest
    * trade vs p13's exact equi-depth sort: resolution is pinned by `bins`,
    * in exchange for O(bins)-sized mergeable state instead of a global
    * re-sort per refresh — the t-digest role, exact-arithmetic portable.
    *
    * Bounds are the GLOBAL [min, max] cents of `valCol` in `df` (1-row
    * broadcast, like distDrift); all partitions share them, which is what
    * makes the bins align for merging. Output: (part, bin, minc, maxc, n).
    *
    * Scale notes: one narrow bucket projection + one (part, bin) hash agg
    * — map-side combined, |parts|×bins summary rows, nothing collected.
    */
  def histSummaries(df: DataFrame, partCol: Column, valCol: String,
      bins: Int): DataFrame = {
    require(bins >= 2, "bins must be >= 2")
    val cents = df.filter(col(valCol).isNotNull)
      .select(partCol.cast("string").as("part"),
        (col(valCol).cast("decimal(18,2)") * 100).cast("long").as("c"))
    val bounds = cents.agg(min(col("c")).as("minc"), max(col("c")).as("maxc"))
    cents.crossJoin(broadcast(bounds))
      // (c-minc)*bins DIV (span+1) lands every in-bounds value in
      // [0, bins-1] exactly — no clamp needed for same-frame bounds
      .select(col("part"),
        expr(s"((c - minc) * $bins) DIV (maxc - minc + 1)").as("bin"),
        col("minc"), col("maxc"))
      .groupBy(col("part"), col("bin"), col("minc"), col("maxc"))
      .agg(count(lit(1)).as("n"))
  }

  /** Percentiles from merged [[histSummaries]] rows: for each requested
    * basis-point rank (5000 = P50), the bucket containing ceil(p·N) and a
    * within-bucket linear interpolation — a deterministic function of the
    * exact integer bin counts, identical in both engines. Output:
    * (p_bp, est), `psBp` order not guaranteed (sort on p_bp).
    */
  def histQuantiles(summ: DataFrame, bins: Int, psBp: Seq[Int]): DataFrame = {
    require(psBp.nonEmpty && psBp.forall(p => p >= 1 && p <= 10000),
      "quantile ranks are basis points in [1, 10000]")
    val mergedRaw = summ.groupBy(col("bin"), col("minc"), col("maxc"))
      .agg(sum(col("n")).as("n"))
    // bins are only addable when every summary was built against the SAME
    // global (minc, maxc): summaries from frames with different bounds
    // would silently coexist as distinct (bin, minc, maxc) rows and the
    // bin-ordered cumulative sum below would interleave them into a wrong
    // quantile. Fail LOUDLY instead: assert_true raises mid-plan when more
    // than one bounds pair survives the merge (min/max over the whole
    // summary-sized relation — cheap). Rescale to common bounds upstream
    // before merging summaries from different eras.
    val bPair = struct(col("minc"), col("maxc"))
    val wAll = Window.partitionBy()
    val merged = mergedRaw
      .withColumn("_bounds_ok", min(bPair).over(wAll) === max(bPair).over(wAll))
      .filter(assert_true(col("_bounds_ok"),
        lit("histQuantiles: merged summaries carry mixed (minc, maxc) " +
          "bounds — rescale to common bounds before merging")).isNull)
      .drop("_bounds_ok")
    // summary-sized relation (<= bins rows): the unpartitioned windows are
    // deliberate and cheap
    val wcum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = merged
      .withColumn("cumn", sum(col("n")).over(wcum))
      .withColumn("ntot", sum(col("n")).over(Window.partitionBy()))
    val pRel = summ.sparkSession.range(1)
      .select(explode(array(psBp.map(p => lit(p)): _*)).as("p_bp"))
    cum.crossJoin(broadcast(pRel))
      .withColumn("rank", expr("(p_bp * ntot + 9999) DIV 10000")) // ceil
      .filter(col("cumn") >= col("rank") &&
        (col("cumn") - col("n")) < col("rank"))
      .select(col("p_bp"),
        ((col("minc").cast("double") +
          (col("bin").cast("double") +
            (col("rank") - (col("cumn") - col("n"))).cast("double") /
              col("n").cast("double")) *
            ((col("maxc") - col("minc") + lit(1L)).cast("double") /
              lit(bins.toDouble))) / lit(100.0)).as("est"))
  }

  /** DuckDB mirror of histSummaries → merge → histQuantiles over `table`
    * (same bucket integers, same interpolation expression tree).
    */
  def histQuantilesSql(table: String, partExpr: String, valCol: String,
      bins: Int, psBp: Seq[Int]): String =
    s"""WITH cents AS (
       |  SELECT $partExpr AS part,
       |    CAST(CAST($valCol AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
       |  FROM $table WHERE $valCol IS NOT NULL),
       |bounds AS (SELECT MIN(c) AS minc, MAX(c) AS maxc FROM cents),
       |summ AS (
       |  SELECT part, ((c - minc) * $bins) // (maxc - minc + 1) AS bin,
       |    minc, maxc, COUNT(*) AS n
       |  FROM cents CROSS JOIN bounds GROUP BY 1, 2, 3, 4),
       |merged AS (
       |  SELECT bin, minc, maxc, SUM(n) AS n FROM summ GROUP BY 1, 2, 3),
       |cum AS (
       |  SELECT bin, minc, maxc, n,
       |    SUM(n) OVER (ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn,
       |    SUM(n) OVER () AS ntot
       |  FROM merged),
       |ps AS (SELECT unnest([${psBp.mkString(", ")}]) AS p_bp),
       |ranked AS (
       |  SELECT *, (p_bp * ntot + 9999) // 10000 AS rank
       |  FROM cum CROSS JOIN ps)
       |SELECT p_bp,
       |  (CAST(minc AS DOUBLE) +
       |    (CAST(bin AS DOUBLE) +
       |      CAST(rank - (cumn - n) AS DOUBLE) / CAST(n AS DOUBLE)) *
       |    (CAST(maxc - minc + 1 AS DOUBLE) / ${bins}.0)) / 100.0 AS est
       |FROM ranked
       |WHERE cumn >= rank AND (cumn - n) < rank""".stripMargin

  def profileSql(table: String, numericCols: Seq[String],
      stringCols: Seq[String]): String = {
    val selects = numericCols.map { c =>
      s"""SELECT '$c' AS "column", COUNT(*) AS n,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM $table""".stripMargin
    } ++ stringCols.map { c =>
      s"""SELECT '$c' AS "column", COUNT(*) AS n,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  CAST(MIN($c) AS VARCHAR) AS min_str, CAST(MAX($c) AS VARCHAR) AS max_str
         |FROM $table""".stripMargin
    }
    selects.mkString("\nUNION ALL\n")
  }

  /** Certification twin of `profile(approx = true)`: joins the HLL profile
    * against the exact profile on column name and emits the EXACT stats
    * plus within_tol = "the HLL n_distinct landed within max(2, 10%) of
    * exact" (3.4M-register HLL++ at the default 5% rsd stays well inside
    * 10% at any SF, so the flag is deterministic in practice). This is
    * VERIFICATION mode — it pays the exact count-distinct Expand on
    * purpose so the sketch has something to be certified against;
    * production ANALYZE at 100 TB stays `profile(approx = true)`. The
    * point of the boolean: the sketch estimate itself is engine-specific
    * and can never hash-match an oracle, but "estimate within stated
    * tolerance of exact" is a deterministic, hash-checkable claim.
    */
  def profileCertified(df: DataFrame, numericCols: Seq[String],
      stringCols: Seq[String]): DataFrame = {
    val exact = profile(df, numericCols, stringCols)
    val approx = profile(df, numericCols, stringCols, approx = true)
      .select(col("column").as("_c"), col("n_distinct").as("_nd_hll"))
    exact.join(broadcast(approx), col("column") === col("_c"))
      .withColumn("within_tol",
        abs(col("_nd_hll") - col("n_distinct")).cast("double") <=
          greatest(lit(2.0), col("n_distinct").cast("double") * lit(0.1)))
      .drop("_c", "_nd_hll")
  }

  /** Oracle mirror of `profileCertified`: the exact profile plus the
    * literal TRUE the engine must reproduce for the hash to match.
    */
  def profileCertifiedSql(table: String, numericCols: Seq[String],
      stringCols: Seq[String]): String =
    s"""SELECT *, TRUE AS within_tol FROM (
       |${profileSql(table, numericCols, stringCols)}
       |)""".stripMargin
}
