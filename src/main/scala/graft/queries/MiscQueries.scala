package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Completeness slice: scalar broadcast (the reference's date-onto-rows
  * pattern as a degenerate cross join), date-part extraction, deterministic
  * arg-max, range join against interval buckets, and the HLL sketch surface
  * (rows-only: approx results are engine-specific).
  */
object MiscQueries {
  import Num._

  val all: Seq[Q] = Seq(
    // P4-analog: broadcast a 1-row scalar frame onto the fact table — the
    // relational form of stamping the scraped date on every row
    // (reference div_link_handler.py:282).
    Q("q21_scalar_broadcast_snapshot",
      (s, dir) => {
        val t = Tables(s, dir)
        val snapshot = t.orders.agg(max(to_date(col("o_orderdate"))).as("snap"))
        t.lineitem
          .crossJoin(broadcast(snapshot))
          .filter(datediff(col("snap"), to_date(col("l_shipdate"))) <= 90)
          .groupBy(col("l_linestatus"))
          .agg(count(lit(1)).as("n_recent"))
      },
      Some("""WITH snap AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS snap FROM orders)
             |SELECT l_linestatus, COUNT(*) AS n_recent
             |FROM lineitem CROSS JOIN snap
             |WHERE datediff('day', CAST(l_shipdate AS DATE), snap) <= 90
             |GROUP BY l_linestatus""".stripMargin)),

    // D1-D3-analog: date-part extraction + monthly revenue matrix.
    Q("q22_monthly_order_totals",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
            month(col("o_orderdate")).cast("long").as("mo"))
          .agg(sumd(col("o_totalprice")).as("sum_total"), count(lit(1)).as("n"))
      },
      Some(s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
              |  CAST(month(o_orderdate) AS BIGINT) AS mo,
              |  ${sqlSumd("o_totalprice")} AS sum_total, COUNT(*) AS n
              |FROM orders GROUP BY 1, 2""".stripMargin)),

    // Deterministic arg-max via join-back (ties broken by min partkey).
    Q("q23_priciest_part_per_brand",
      (s, dir) => {
        val t = Tables(s, dir)
        val maxPrice = t.part.groupBy(col("p_brand").as("b"))
          .agg(max(col("p_retailprice")).as("max_price"))
        t.part
          .join(broadcast(maxPrice),
            col("p_brand") === col("b") && col("p_retailprice") === col("max_price"))
          .groupBy(col("p_brand"))
          .agg(min(col("p_partkey")).as("top_partkey"), max(col("max_price")).as("max_price"))
      },
      Some("""WITH m AS (SELECT p_brand AS b, MAX(p_retailprice) AS max_price
             |  FROM part GROUP BY 1)
             |SELECT p_brand, MIN(p_partkey) AS top_partkey, MAX(max_price) AS max_price
             |FROM part JOIN m ON p_brand = b AND p_retailprice = max_price
             |GROUP BY p_brand""".stripMargin)),

    // Range join: event values against interval buckets (broadcast the tiny
    // bucket table; the between-condition becomes a BNLJ filter).
    Q("s06_value_range_buckets",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val buckets = Seq(
          ("tiny", 0.0, 50.0), ("small", 50.0, 100.0),
          ("mid", 100.0, 150.0), ("large", 150.0, 1e9))
          .toDF("bucket", "lo", "hi")
        t.events
          .join(broadcast(buckets),
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
      },
      Some(s"""WITH buckets(bucket, lo, hi) AS (VALUES
              |  ('tiny', 0.0, 50.0), ('small', 50.0, 100.0),
              |  ('mid', 100.0, 150.0), ('large', 150.0, 1e9))
              |SELECT bucket, COUNT(*) AS n, ${sqlSumd("value")} AS sum_value
              |FROM events JOIN buckets ON value >= lo AND value < hi
              |GROUP BY bucket""".stripMargin)),

    // Full grouping-sets surface: CUBE over two dimensions.
    Q("q25_cube_volumes",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(sumd(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${sqlSumd("l_quantity")} AS sum_qty, COUNT(*) AS n
              |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // Navigation window functions: per-customer order timeline with
    // lead/lag deltas and spend quartiles.
    Q("q26_order_timeline",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
        t.orders
          .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
          .withColumn("gap_days",
            datediff(to_date(col("o_orderdate")), to_date(col("prev_date"))).cast("long"))
          .withColumn("quartile", ntile(4).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
              .orderBy(col("o_totalprice"), col("o_orderkey"))).cast("long"))
          .select(col("o_orderkey"), col("o_custkey"), col("gap_days"), col("quartile"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  CAST(datediff('day',
             |    CAST(lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DATE),
             |    CAST(o_orderdate AS DATE)) AS BIGINT) AS gap_days,
             |  CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS quartile
             |FROM orders""".stripMargin)),

    // Fuzzy duplicate candidates with blocking: pairs are generated only
    // inside a (brand, type) block — the standard blocking-key pattern that
    // keeps fuzzy matching linear-ish at scale — then verified with exact
    // levenshtein (engine-portable).
    Q("q27_fuzzy_part_names",
      (s, dir) => {
        val t = Tables(s, dir)
        // Distance computations scale with DISTINCT names, not rows: group
        // to (brand, typ, name, cnt) first, run levenshtein once per name
        // pair, and weight the pair count by multiplicities. Row pairs with
        // a.key < b.key map exactly onto name pairs: an unordered cross
        // pair contributes cnt_a·cnt_b (whichever row has the smaller key
        // plays 'a'), a same-name group contributes C(cnt,2) — and only
        // when cnt ≥ 2 (a lone row is no pair, and must not pull min_dist
        // to 0). The naive row-pair form did 100× the levenshtein work at
        // 10× the rows (quadratic in bucket size); this form is quadratic
        // only in per-bucket distinct names. Same two prunes as before:
        // free length prefilter + thresholded early-exit levenshtein.
        val names = t.part
          .groupBy(col("p_brand").as("brand"), col("p_type").as("typ"),
            col("p_name").as("name"))
          .agg(count(lit(1)).as("cnt"))
        names.as("a").join(names.as("b"),
            col("a.brand") === col("b.brand") && col("a.typ") === col("b.typ") &&
              col("a.name") <= col("b.name") &&
              (col("a.name") < col("b.name") || col("a.cnt") >= 2) &&
              abs(length(col("a.name")) - length(col("b.name"))) <= 12)
          .withColumn("dist", levenshtein(col("a.name"), col("b.name"), 12).cast("long"))
          .filter(col("dist") >= 0)
          .withColumn("w",
            // C(cnt,2) via shiftright: Spark's `/` is double division, and
            // doubles lose exactness past 2^52 — the product is even, so a
            // right shift is the exact long halving
            when(col("a.name") === col("b.name"),
              shiftright(col("a.cnt") * (col("a.cnt") - 1), 1))
              .otherwise(col("a.cnt") * col("b.cnt")))
          .groupBy(col("a.brand").as("brand"))
          .agg(sum(col("w")).cast("long").as("n_close_pairs"),
            min(col("dist")).as("min_dist"))
      },
      Some("""SELECT a.p_brand AS brand, COUNT(*) AS n_close_pairs,
             |  CAST(MIN(levenshtein(a.p_name, b.p_name)) AS BIGINT) AS min_dist
             |FROM part a JOIN part b
             |  ON a.p_brand = b.p_brand AND a.p_type = b.p_type AND a.p_partkey < b.p_partkey
             |WHERE levenshtein(a.p_name, b.p_name) <= 12
             |GROUP BY a.p_brand""".stripMargin)),

    // The DataFrame pivot API proper (q16 is the manual CASE form).
    Q("q28_pivot_api",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(sum(dec(col("l_quantity"))).cast("double"))
          .select(col("l_linestatus"), col("A").as("qty_a"),
            col("N").as("qty_n"), col("R").as("qty_r"))
      },
      Some(s"""SELECT l_linestatus,
              |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN ${sqlDec("l_quantity")} END) AS DOUBLE) AS qty_a,
              |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN ${sqlDec("l_quantity")} END) AS DOUBLE) AS qty_n,
              |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN ${sqlDec("l_quantity")} END) AS DOUBLE) AS qty_r
              |FROM lineitem GROUP BY l_linestatus""".stripMargin)),

    // Unpivot/melt: wide account-balance stats back to long form.
    Q("q29_unpivot",
      (s, dir) => {
        val t = Tables(s, dir)
        val wide = t.customer.groupBy(col("c_mktsegment"))
          .agg(
            sumd(col("c_acctbal")).as("sum_bal"),
            min(col("c_acctbal")).as("min_bal"),
            max(col("c_acctbal")).as("max_bal"))
        wide.unpivot(
          ids = Array(col("c_mktsegment")),
          values = Array(col("sum_bal"), col("min_bal"), col("max_bal")),
          variableColumnName = "stat", valueColumnName = "value")
      },
      Some(s"""WITH wide AS (
              |  SELECT c_mktsegment, ${sqlSumd("c_acctbal")} AS sum_bal,
              |         MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
              |  FROM customer GROUP BY c_mktsegment)
              |SELECT c_mktsegment, stat, value
              |FROM wide UNPIVOT (value FOR stat IN (sum_bal, min_bal, max_bal))""".stripMargin)),

    // Latest-wins upsert (MERGE analog): apply simulated corrections (10%
    // price bump for every 100th customer's orders) over the base table and
    // aggregate the merged state.
    Q("q30_upsert_latest_wins",
      (s, dir) => {
        val t = Tables(s, dir)
        val base = t.orders.withColumn("version", lit(1L))
        val updates = t.orders
          .filter(col("o_custkey") % 100 === 0)
          // exact 2dp × 1.10 (3-4dp result); no division, no rounding
          .withColumn("o_totalprice",
            (dec(col("o_totalprice")) * lit("1.10").cast("decimal(3,2)")).cast("double"))
          .withColumn("version", lit(2L))
        graft.ingest.Upsert.latestWins(base, updates, Seq("o_orderkey"), "version")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            // scale-4 exact sum: bumped prices carry 4 decimals
            sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("sum_price"),
            count(when(col("version") === 2, lit(1))).as("n_updated"))
      },
      Some(s"""WITH u AS (
              |  SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version, 0 AS _src FROM orders
              |  UNION ALL
              |  SELECT o_orderkey, o_orderstatus,
              |    CAST(${sqlDec("o_totalprice")} * CAST(1.10 AS DECIMAL(3,2)) AS DOUBLE),
              |    2, 1 FROM orders WHERE o_custkey % 100 = 0),
              |merged AS (
              |  SELECT * FROM (
              |    SELECT u.*, ROW_NUMBER() OVER (PARTITION BY o_orderkey
              |      ORDER BY version DESC, _src DESC) AS _rn FROM u)
              |  WHERE _rn = 1)
              |SELECT o_orderstatus, COUNT(*) AS n,
              |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
              |  COUNT(CASE WHEN version = 2 THEN 1 END) AS n_updated
              |FROM merged GROUP BY o_orderstatus""".stripMargin)),

    // Statistical moments, portably exact: Σx, Σx², Σx³ (and Σxy) accumulate
    // in DECIMAL — order-independent, so parallel-safe — then the textbook
    // recombinations run in double with the identical operation tree in both
    // engines, making stddev/corr/skewness whole-row hash-matchable.
    // (9,2)-cast inputs keep every product within DECIMAL(38): x² is (19,4),
    // x³ is (29,6). The built-in one-pass stddev_samp/corr/skewness remain
    // spec-covered (tolerance) — they are mathematically equal but
    // engine-specific in summation order.
    // One extra wrinkle: a decimal sum whose integer representation exceeds
    // 2^53 (Σprice² does) casts to double with DOUBLE rounding in DuckDB
    // (int128→double, then /10^scale) but single rounding in Spark — an ulp
    // apart. So each big sum is carried as SUM(floor(e)) in BIGINT (int64→
    // double is one correctly-rounded conversion in both engines) plus the
    // exact fractional decimal SUM(e - floor(e)), recombined in double.
    Q("q33_stats_moments",
      (s, dir) => {
        val t = Tables(s, dir)
        def d2(c: String) = col(c).cast("decimal(9,2)")
        def splitSum(e: Column, name: String): Seq[Column] = Seq(
          sum(floor(e).cast("long")).as(name + "i"),
          sum(e - floor(e)).as(name + "f"))
        val aggs: Seq[Column] = Seq(count(lit(1)).as("n")) ++
          splitSum(d2("l_quantity"), "sx") ++
          splitSum(d2("l_quantity") * d2("l_quantity"), "sx2") ++
          splitSum(d2("l_extendedprice"), "sy") ++
          splitSum(d2("l_extendedprice") * d2("l_extendedprice"), "sy2") ++
          splitSum(d2("l_quantity") * d2("l_extendedprice"), "sxy") ++
          Seq(
            sum(d2("l_discount")).as("sz"),
            sum(d2("l_discount") * d2("l_discount")).as("sz2"),
            sum(d2("l_discount") * d2("l_discount") * d2("l_discount")).as("sz3"))
        val sums = t.lineitem.groupBy(col("l_returnflag"))
          .agg(aggs.head, aggs.tail: _*)
        def big(name: String): Column =
          col(name + "i").cast("double") + col(name + "f").cast("double")
        def dd(c: String) = col(c).cast("double")
        val nd = col("n").cast("double")
        val (sx, sx2, sy, sy2, sxy) =
          (big("sx"), big("sx2"), big("sy"), big("sy2"), big("sxy"))
        val mz = dd("sz") / nd
        val m2 = dd("sz2") / nd - mz * mz
        sums.select(
          col("l_returnflag"),
          sqrt((sx2 - sx * sx / nd) / (nd - lit(1.0))).as("sd_qty"),
          ((nd * sxy - sx * sy) /
            (sqrt(nd * sx2 - sx * sx) * sqrt(nd * sy2 - sy * sy)))
            .as("corr_qty_price"),
          ((dd("sz3") / nd - lit(3.0) * mz * (dd("sz2") / nd) +
            lit(2.0) * mz * mz * mz) / (m2 * sqrt(m2)))
            .as("skew_disc"),
          col("n"))
      },
      Some {
        def prod(c: String, k: Int) =
          (0 until k).map(_ => s"CAST($c AS DECIMAL(9,2))").mkString(" * ")
        def splitSum(e: String, name: String) =
          s"SUM(CAST(floor($e) AS BIGINT)) AS ${name}i, SUM(($e) - floor($e)) AS ${name}f"
        def big(name: String) = s"(CAST(${name}i AS DOUBLE) + CAST(${name}f AS DOUBLE))"
        val n = "CAST(n AS DOUBLE)"
        val (sx, sx2, sy, sy2, sxy) =
          (big("sx"), big("sx2"), big("sy"), big("sy2"), big("sxy"))
        val (sz, sz2, sz3) =
          ("CAST(sz AS DOUBLE)", "CAST(sz2 AS DOUBLE)", "CAST(sz3 AS DOUBLE)")
        val mz = s"($sz / $n)"
        val m2 = s"($sz2 / $n - $mz * $mz)"
        s"""WITH sums AS (
           |  SELECT l_returnflag, COUNT(*) AS n,
           |    ${splitSum(prod("l_quantity", 1), "sx")},
           |    ${splitSum(prod("l_quantity", 2), "sx2")},
           |    ${splitSum(prod("l_extendedprice", 1), "sy")},
           |    ${splitSum(prod("l_extendedprice", 2), "sy2")},
           |    ${splitSum(s"CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))", "sxy")},
           |    SUM(${prod("l_discount", 1)}) AS sz,
           |    SUM(${prod("l_discount", 2)}) AS sz2,
           |    SUM(${prod("l_discount", 3)}) AS sz3
           |  FROM lineitem GROUP BY 1)
           |SELECT l_returnflag,
           |  sqrt(($sx2 - $sx * $sx / $n) / ($n - 1.0)) AS sd_qty,
           |  ($n * $sxy - $sx * $sy) /
           |    (sqrt($n * $sx2 - $sx * $sx) * sqrt($n * $sy2 - $sy * $sy)) AS corr_qty_price,
           |  ($sz3 / $n - 3.0 * $mz * ($sz2 / $n) + 2.0 * $mz * $mz * $mz) /
           |    ($m2 * sqrt($m2)) AS skew_disc,
           |  n
           |FROM sums""".stripMargin
      }),

    // Distinct-count sketch, portably: KMV (bottom-k). With h_(k) the k-th
    // smallest of the distinct 32-bit md5 hashes, est = (k-1)/(h_(k)/2^32);
    // a group with fewer than k distinct hashes is exact by construction.
    // This is the oracle-checkable twin of approx_count_distinct (HLL,
    // engine-specific — spec-covered with tolerance). Scale path: a
    // BottomKSketch partial heap (ObjectHashAggregate) finds count and
    // h_(k) in one pass — nothing is globally sorted; the only full-data
    // shuffle is the distinct() the estimator's input contract requires.
    Q("q24_approx_distinct_parts",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val k = 1024
        // dedup the RAW key pairs first (cheap partial hash-agg, no md5 on
        // the full table), hash the ~|parts|×|flags| survivors, then dedup
        // hashes — identical to hashing every row (same hash set), 10× less
        // md5 work
        val hashed = t.lineitem.select(col("l_returnflag"), col("l_partkey"))
          .distinct()
          .select(col("l_returnflag"),
            graft.functions.TextFns.md5Hash32(col("l_partkey").cast("string")).as("h"))
          .distinct()
        val kmv = hashed.as[(String, Long)]
          .groupByKey(_._1)
          .mapValues(_._2)
          .agg(new graft.operators.BottomKSketch(k).toColumn.name("kmv"))
          .toDF("l_returnflag", "kmv")
        kmv.select(col("l_returnflag"),
            graft.operators.Kmv.estimate(k, col("kmv._1"), col("kmv._2"))
              .as("est_parts"),
            col("kmv._1").as("n_distinct_hashes"))
      },
      Some(s"""WITH hashed AS (
              |  SELECT DISTINCT l_returnflag,
              |    ${graft.functions.TextFns.md5Hash32Sql("CAST(l_partkey AS VARCHAR)")} AS h
              |  FROM lineitem),
              |counts AS (
              |  SELECT l_returnflag, COUNT(*) AS n_distinct_hashes
              |  FROM hashed GROUP BY 1),
              |kth AS (
              |  SELECT l_returnflag, h AS kth FROM (
              |    SELECT l_returnflag, h,
              |      ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
              |    FROM hashed) WHERE rn = 1024)
              |SELECT counts.l_returnflag,
              |  CASE WHEN kth IS NULL THEN CAST(n_distinct_hashes AS DOUBLE)
              |       ELSE CAST(1023 AS DOUBLE) / (CAST(kth AS DOUBLE) / 4294967296.0)
              |  END AS est_parts,
              |  n_distinct_hashes
              |FROM counts LEFT JOIN kth USING (l_returnflag)""".stripMargin)),

    // Column-level data profiling (ANALYZE-TABLE shape): one pass computes
    // every column's row/null/distinct counts and min/max; numeric and
    // string extremes live in separate typed columns so no
    // engine-dependent number formatting enters the hash.
    Q("p01_profile_orders",
      (s, dir) => graft.operators.Profiler.profile(Tables(s, dir).orders,
        numericCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
        stringCols = Seq("o_orderstatus", "o_orderpriority")),
      Some(graft.operators.Profiler.profileSql("orders",
        Seq("o_orderkey", "o_custkey", "o_totalprice"),
        Seq("o_orderstatus", "o_orderpriority")))),

    // The 100 TB ANALYZE mode of p01: HLL++ distinct counts — no Expand,
    // one map-side-combined pass (ProfilerSpec asserts the Expand-free
    // single-scan plan of the production approx mode). The DECLARED query
    // is the certified twin: exact stats + within_tol = "HLL estimate
    // within max(2, 10%) of exact" — fully hash-checkable (the oracle
    // emits the TRUE literal), so sketch drift fails loudly instead of
    // hiding behind a rows-only gate.
    Q("p02_profile_orders_approx",
      (s, dir) => graft.operators.Profiler.profileCertified(Tables(s, dir).orders,
        numericCols = Seq("o_orderkey", "o_custkey", "o_totalprice"),
        stringCols = Seq("o_orderstatus", "o_orderpriority")),
      Some(graft.operators.Profiler.profileCertifiedSql("orders",
        Seq("o_orderkey", "o_custkey", "o_totalprice"),
        Seq("o_orderstatus", "o_orderpriority")))),

    // Trailing-window anomaly detection with a RANGE frame: daily revenue
    // per order priority, spike = day revenue more than 2x the trailing
    // 7-day average (window EXCLUDES the current day). The frame is
    // rangeBetween(-7, -1) over a day NUMBER — calendar-aware (a gap of
    // missing days shrinks the lookback window, unlike rowsBetween which
    // would silently reach further into the past). Decimal window sums +
    // cross-multiplied integer-exact comparison (rev * n > 2 * sum) keep
    // the flag engine-exact; divisions only in reported ratios.
    Q("q36_trailing_window_spikes",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables(s, dir)
        val daily = t.orders
          .groupBy(col("o_orderpriority").as("priority"),
            to_date(col("o_orderdate")).as("day"))
          .agg(sum(dec(col("o_totalprice"))).as("rev"))
          .withColumn("day_num",
            datediff(col("day"), to_date(lit("1995-01-01"))).cast("long"))
        val w = Window.partitionBy(col("priority")).orderBy(col("day_num"))
          .rangeBetween(-7, -1)
        daily
          .withColumn("trail_sum", sum(col("rev")).over(w))
          .withColumn("trail_n", count(col("rev")).over(w))
          .filter(col("trail_n") >= 3 &&
            col("rev") * col("trail_n") > col("trail_sum") * 2)
          .select(col("priority"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("rev").cast("double").as("rev"),
            (col("trail_sum").cast("double") / col("trail_n")).as("trail_avg"),
            col("trail_n"))
      },
      Some(s"""WITH daily AS (
              |  SELECT o_orderpriority AS priority,
              |    CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
              |    SUM(${sqlDec("o_totalprice")}) AS rev
              |  FROM orders GROUP BY 1, 2),
              |win AS (
              |  SELECT priority, day, rev,
              |    datediff('day', DATE '1995-01-01', day) AS day_num,
              |    SUM(rev) OVER (PARTITION BY priority ORDER BY
              |      datediff('day', DATE '1995-01-01', day)
              |      RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail_sum,
              |    COUNT(rev) OVER (PARTITION BY priority ORDER BY
              |      datediff('day', DATE '1995-01-01', day)
              |      RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS trail_n
              |  FROM daily)
              |SELECT priority, strftime(day, '%Y-%m-%d') AS day,
              |  CAST(rev AS DOUBLE) AS rev,
              |  CAST(trail_sum AS DOUBLE) / trail_n AS trail_avg, trail_n
              |FROM win
              |WHERE trail_n >= 3 AND rev * trail_n > trail_sum * 2""".stripMargin)),

    // Explicit GROUPING SETS with grouping() provenance bits — finer
    // control than q12's rollup / q25's cube: exactly the (flag, status),
    // (flag), () aggregation levels, nothing else. One Expand + one
    // aggregation in Spark; grouping(col) arithmetic mirrors DuckDB's.
    Q("q37_grouping_sets",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .groupingSets(
            Seq(Seq(col("l_returnflag"), col("l_linestatus")),
              Seq(col("l_returnflag")), Seq()),
            col("l_returnflag"), col("l_linestatus"))
          .agg(
            (grouping(col("l_returnflag")) * 2 + grouping(col("l_linestatus")))
              .cast("long").as("gid"),
            count(lit(1)).as("n"), sumd(col("l_quantity")).as("sum_qty"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("status"),
            col("gid"), col("n"), col("sum_qty"))
      },
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS flag,
              |  COALESCE(l_linestatus, 'ALL') AS status,
              |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
              |  COUNT(*) AS n, ${sqlSumd("l_quantity")} AS sum_qty
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
              |  (l_returnflag), ())""".stripMargin)),

    // Per-partition content fingerprints (operators/Fingerprint): compare
    // (n_rows, order-independent row-hash sum) per month instead of moving
    // the data — the "did the copy land identical" check after migration /
    // re-ingest. Row string uses only stable renderings (ints, strings,
    // formatted date, decimal-scaled cents) — raw doubles never enter a
    // fingerprint.
    // Per-partition content fingerprints (operators/Fingerprint): compare
    // (n_rows, order-independent row-hash sum) per month instead of moving
    // the data — the "did the copy land identical" check after migration /
    // re-ingest. Row string uses only stable renderings (ints, strings,
    // formatted date, decimal-scaled cents) — raw doubles never enter a
    // fingerprint.
    Q("p04_partition_fingerprint",
      (s, dir) => {
        val t = Tables(s, dir)
        val rowStr = concat_ws("|",
          col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          (dec(col("o_totalprice")) * 100).cast("long"),
          date_format(col("o_orderdate"), "yyyy-MM-dd"), col("o_orderpriority"))
        graft.operators.Fingerprint.of(t.orders,
          Seq(date_format(col("o_orderdate"), "yyyy-MM").as("month")), rowStr)
      },
      Some {
        val cents = s"CAST(${sqlDec("o_totalprice")} * 100 AS BIGINT)"
        graft.operators.Fingerprint.sql("orders",
          Seq("strftime(o_orderdate, '%Y-%m')" -> "month"),
          "o_orderkey || '|' || o_custkey || '|' || o_orderstatus || '|' || " +
            cents + " || '|' || " +
            "strftime(o_orderdate, '%Y-%m-%d') || '|' || o_orderpriority")
      }),

    // Per-group NTILE deciles: position-based 10-bucket split within each
    // order priority (deterministic total order via the orderkey tiebreak),
    // then per-bucket stats. Partitioned windows keep every sort bounded by
    // the largest single group — the scale-safe ntile shape; a GLOBAL ntile
    // would serialize on one reducer and belongs to quantile-boundary
    // bucketing (q15) instead.
    Q("q38_ntile_deciles",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        t.orders
          .withColumn("decile", ntile(10).over(w).cast("long"))
          .groupBy(col("o_orderpriority").as("priority"), col("decile"))
          .agg(count(lit(1)).as("n"),
            min(col("o_totalprice")).as("min_price"),
            max(col("o_totalprice")).as("max_price"),
            sumd(col("o_totalprice")).as("sum_price"))
      },
      Some(s"""WITH d AS (
              |  SELECT o_orderpriority AS priority, o_totalprice,
              |    ntile(10) OVER (PARTITION BY o_orderpriority
              |      ORDER BY o_totalprice, o_orderkey) AS decile
              |  FROM orders)
              |SELECT priority, CAST(decile AS BIGINT) AS decile, COUNT(*) AS n,
              |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
              |  ${sqlSumd("o_totalprice")} AS sum_price
              |FROM d GROUP BY 1, 2""".stripMargin)),

    // Window-function completeness sweep: ranking (dense_rank,
    // percent_rank, cume_dist), navigation (lag/lead with defaults,
    // first_value, nth_value) over one deterministic per-brand ordering —
    // ONE window spec, so Spark evaluates all seven functions in a single
    // sort/exchange. percent_rank and cume_dist are exact small-integer
    // divisions, engine-stable.
    Q("q39_window_functions",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice"), col("p_partkey"))
        t.part.filter(col("p_size") >= 40)
          .select(col("p_brand"), col("p_partkey"),
            col("p_retailprice"),
            dense_rank().over(w).cast("long").as("drank"),
            percent_rank().over(w).as("prank"),
            cume_dist().over(w).as("cdist"),
            lag(col("p_retailprice"), 1, -1.0).over(w).as("prev_price"),
            lead(col("p_retailprice"), 1, -1.0).over(w).as("next_price"),
            first(col("p_partkey")).over(w).as("cheapest_key"),
            nth_value(col("p_partkey"), 2).over(w).as("second_key"))
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice,
             |  CAST(DENSE_RANK() OVER w AS BIGINT) AS drank,
             |  PERCENT_RANK() OVER w AS prank,
             |  CUME_DIST() OVER w AS cdist,
             |  LAG(p_retailprice, 1, -1.0) OVER w AS prev_price,
             |  LEAD(p_retailprice, 1, -1.0) OVER w AS next_price,
             |  FIRST_VALUE(p_partkey) OVER w AS cheapest_key,
             |  NTH_VALUE(p_partkey, 2) OVER w AS second_key
             |FROM part WHERE p_size >= 40
             |WINDOW w AS (PARTITION BY p_brand
             |  ORDER BY p_retailprice, p_partkey)""".stripMargin)),

    // Revenue share per group (TPC-H Q8's market-share shape): each
    // priority's exact decimal revenue against the corpus total via a
    // 1-row broadcast — NOT a whole-table window (an unpartitioned window
    // serializes on one reducer; the broadcast scalar doesn't). One scan,
    // two aggs, one exact division per output row.
    Q("q41_revenue_share",
      (s, dir) => {
        val t = Tables(s, dir)
        val byPrio = t.orders.groupBy(col("o_orderpriority").as("priority"))
          .agg(sum(dec(col("o_totalprice"))).as("rev"))
        val total = byPrio.agg(sum(col("rev")).as("total"))
        byPrio.crossJoin(broadcast(total))
          .select(col("priority"), col("rev").cast("double").as("rev"),
            (col("rev").cast("double") / col("total").cast("double")).as("share"))
      },
      Some(s"""WITH g AS (
              |  SELECT o_orderpriority AS priority, SUM(${sqlDec("o_totalprice")}) AS rev
              |  FROM orders GROUP BY 1),
              |t AS (SELECT SUM(rev) AS total FROM g)
              |SELECT priority, CAST(rev AS DOUBLE) AS rev,
              |  CAST(rev AS DOUBLE) / CAST(total AS DOUBLE) AS share
              |FROM g CROSS JOIN t""".stripMargin)),

    // The 100 TB percentile path (companion to q15's exact distributed
    // sort): approx_percentile is Spark's mergeable quantile-summary
    // aggregate — one pass, map-side combined, no global sort. Sketch
    // values are engine-specific, so the DECLARED output is the fully
    // hash-checkable form: the exact p50/p90/p99 (groupedQuantileCont,
    // bit-identical to DuckDB quantile_cont — the q15 proof) plus
    // within_tol = "the sketch landed within 1% of exact on all three
    // ranks". accuracy=10000 bounds rank error at n/10000 (relative, so
    // the 1% value tolerance holds at every SF); the oracle asserts
    // within_tol IS true by emitting the literal — a sketch drift becomes
    // a loud hash mismatch, not an unverifiable number.
    Q("p06_approx_percentiles",
      (s, dir) => {
        val t = Tables(s, dir)
        val exact = graft.operators.Quantiles.groupedQuantileCont(
          t.lineitem, "l_returnflag", "l_extendedprice",
          Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
        val approx = t.lineitem.groupBy(col("l_returnflag").as("_flag"))
          .agg(expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)")
            .as("_ap"))
        exact.join(broadcast(approx), col("l_returnflag") === col("_flag"))
          .withColumn("within_tol",
            abs(expr("_ap[0]") - col("p50")) <= col("p50") * lit(0.01) &&
            abs(expr("_ap[1]") - col("p90")) <= col("p90") * lit(0.01) &&
            abs(expr("_ap[2]") - col("p99")) <= col("p99") * lit(0.01))
          .select(col("l_returnflag"), col("p50"), col("p90"), col("p99"),
            col("n"), col("within_tol"))
      },
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_extendedprice, 0.5) AS p50,
             |  quantile_cont(l_extendedprice, 0.9) AS p90,
             |  quantile_cont(l_extendedprice, 0.99) AS p99,
             |  COUNT(*) AS n, TRUE AS within_tol
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // Equi-width value histogram (the ANALYZE-histogram companion to p01):
    // 10 buckets over o_totalprice with data-derived bounds. All bucket
    // arithmetic is exact BIGINT over decimal cents — ((c - min) * 10) DIV
    // (max - min + 1) — so bucket edges are engine-exact, never a float
    // boundary coin-flip. Bounds are a 1-row broadcast; one scan + one agg.
    Q("p05_value_histogram",
      (s, dir) => {
        val t = Tables(s, dir)
        val cents = (dec(col("o_totalprice")) * 100).cast("long")
        val priced = t.orders.select(cents.as("c"),
          col("o_totalprice").as("price"))
        val bounds = priced.agg(min(col("c")).as("minc"), max(col("c")).as("maxc"))
        priced.crossJoin(broadcast(bounds))
          .select(expr("((c - minc) * 10) DIV (maxc - minc + 1)").as("bucket"),
            col("price"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            min(col("price")).as("min_price"), max(col("price")).as("max_price"))
      },
      Some("""WITH priced AS (
             |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
             |    o_totalprice AS price
             |  FROM orders),
             |bounds AS (SELECT MIN(c) AS minc, MAX(c) AS maxc FROM priced)
             |SELECT ((c - minc) * 10) // (maxc - minc + 1) AS bucket,
             |  COUNT(*) AS n, MIN(price) AS min_price, MAX(price) AS max_price
             |FROM priced CROSS JOIN bounds
             |GROUP BY 1""".stripMargin)),

    // Equi-DEPTH histogram (p05 is equi-width): 8 buckets of ~equal row
    // count split at the exact i/8 quantiles — the optimizer-statistics /
    // data-skew view of a value distribution. Deliberately NOT ntile (a
    // global ntile is one single-partition sort): one range-partitioned
    // boundary sort + one narrow CASE-fold count scan, both scale shapes.
    Q("p13_equidepth_histogram",
      (s, dir) => graft.operators.Quantiles.equiDepthHistogram(
        Tables(s, dir).orders, "o_totalprice", bins = 8),
      Some(graft.operators.Quantiles.equiDepthHistogramSql(
        "orders", "o_totalprice", bins = 8))),

    // MERGEABLE percentile summaries (the t-digest role with exact
    // arithmetic): per-month fixed-bin histograms of order totals whose
    // counts merge by addition, then P50/P90/P99 read off the merged
    // counts with one-bin-width error — p11's incremental-stats shape
    // extended to quantiles (p13's exact equi-depth re-sorts the world
    // per refresh; this folds new partition summaries in). Mergeability
    // itself (per-part summaries == whole-table summary) is spec-proven;
    // the oracle replays the same bucket integers and interpolation.
    Q("p16_mergeable_percentiles",
      (s, dir) => {
        val t = Tables(s, dir)
        val summ = graft.operators.Profiler.histSummaries(
          t.orders, date_format(col("o_orderdate"), "yyyy-MM"),
          "o_totalprice", bins = 20)
        graft.operators.Profiler.histQuantiles(
          summ, bins = 20, psBp = Seq(5000, 9000, 9900))
      },
      Some(graft.operators.Profiler.histQuantilesSql(
        "orders", "strftime(o_orderdate, '%Y-%m')", "o_totalprice",
        bins = 20, psBp = Seq(5000, 9000, 9900)))),

    // Pairwise correlation MATRIX across the lineitem measures in ONE
    // aggregation pass (q33 computes one grouped pair; this is the
    // profiler's all-pairs ANALYZE form): per-column and cross sums all
    // ride a single map-side-combined aggregate, exact integer-cent
    // co-moments (long hi/lo split sums — primitive codegen buffers, with
    // a loud out-of-regime guard) recombined deterministically in double
    // — never the built-in summation-order-dependent corr.
    Q("p14_correlation_matrix",
      (s, dir) => graft.operators.Profiler.correlationMatrix(
        Tables(s, dir).lineitem,
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      Some(graft.operators.Profiler.correlationMatrixSql("lineitem",
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")))),

    // Key-distribution profile (util/Skew.keyStats): the pre-join advisor
    // that decides salting / broadcast / AQE-skew handling from ONE reduced
    // pass — p01 profiles column VALUES, this profiles the GROUP-SIZE
    // distribution of a join/agg key (max vs mean, tail quantiles, hottest
    // key and its exact share).
    Q("p03_key_skew",
      (s, dir) => graft.util.Skew.keyStats(
        Tables(s, dir).lineitem, col("l_partkey")),
      Some(graft.util.Skew.keyStatsSql("lineitem", "l_partkey"))),

    // OHLC + VWAP bars — the reference domain's (commodity market) core
    // downstream analytic, computed the scale-right way: ONE hash
    // aggregation, no window, no sort. Open/close are min_by/max_by on a
    // packed BIGINT event key (epoch-day · 1e12 + orderkey · 10 + line#,
    // unique, so ties are impossible and the pick is deterministic); at
    // scales where the pack could overflow, the same plan runs on a
    // struct ordering key. High/low are plain min/max (exact on IEEE
    // doubles); VWAP is exact decimal sums with ONE double division at
    // the end. Per-row price = extendedprice/quantity is a single IEEE
    // division — bit-identical across engines, unlike any summed double.
    Q("q42_ohlc_vwap_bars",
      (s, dir) => {
        val t = Tables(s, dir)
        val priced = t.lineitem
          .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            date_format(col("l_shipdate"), "yyyy-MM").as("month"),
            (col("l_extendedprice") / col("l_quantity")).as("price"),
            (datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
              .cast("long") * 1000000000000L
              + col("l_orderkey") * 10 + col("l_linenumber")).as("ord"),
            dec(col("l_extendedprice")).as("val_d"),
            dec(col("l_quantity")).as("qty_d"))
        priced.groupBy(col("brand"), col("month"))
          .agg(
            min_by(col("price"), col("ord")).as("open_p"),
            max(col("price")).as("high_p"),
            min(col("price")).as("low_p"),
            max_by(col("price"), col("ord")).as("close_p"),
            (sum(col("val_d")).cast("double") / sum(col("qty_d")).cast("double"))
              .as("vwap"),
            count(lit(1)).as("n"))
      },
      Some(s"""WITH priced AS (
              |  SELECT p_brand AS brand,
              |    strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
              |    l_extendedprice / l_quantity AS price,
              |    datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
              |      * 1000000000000 + l_orderkey * 10 + l_linenumber AS ord,
              |    ${sqlDec("l_extendedprice")} AS val_d,
              |    ${sqlDec("l_quantity")} AS qty_d
              |  FROM lineitem JOIN part ON l_partkey = p_partkey)
              |SELECT brand, month,
              |  arg_min(price, ord) AS open_p,
              |  MAX(price) AS high_p,
              |  MIN(price) AS low_p,
              |  arg_max(price, ord) AS close_p,
              |  CAST(SUM(val_d) AS DOUBLE) / CAST(SUM(qty_d) AS DOUBLE) AS vwap,
              |  COUNT(*) AS n
              |FROM priced GROUP BY 1, 2""".stripMargin)),

    // Robust outlier detection (median / MAD, the profiler-grade anomaly
    // gate): per priority, exact interpolated median of o_totalprice, MAD
    // (median absolute deviation), and the count beyond the classic
    // 3·1.4826·MAD cut. Both medians run through the distributed
    // sort-based quantile (no value-buffering agg); the per-group scalars
    // ride back on broadcast joins, so the fact table streams. Mean/stddev
    // z-scores (q33's moments) move with the outliers they're hunting;
    // median/MAD have a 50% breakdown point — the standard for dirty data.
    Q("p07_mad_outliers",
      (s, dir) => {
        val t = Tables(s, dir)
        val med = graft.operators.Quantiles
          .groupedQuantileCont(t.orders, "o_orderpriority", "o_totalprice",
            Seq(("med", 0.5)))
          .select(col("o_orderpriority"), col("med"))
        val dev = t.orders.join(broadcast(med), Seq("o_orderpriority"))
          .select(col("o_orderpriority"), col("med"),
            abs(col("o_totalprice") - col("med")).as("dev"))
        val mad = graft.operators.Quantiles
          .groupedQuantileCont(dev, "o_orderpriority", "dev", Seq(("mad", 0.5)))
          .select(col("o_orderpriority"), col("mad"))
        dev.join(broadcast(mad), Seq("o_orderpriority"))
          .groupBy(col("o_orderpriority").as("priority"))
          .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
            count(lit(1)).as("n"),
            count(when(col("dev") > lit(3.0) * lit(1.4826) * col("mad"), 1))
              .as("n_out"))
      },
      Some("""WITH med AS (
             |  SELECT o_orderpriority AS p,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS med
             |  FROM orders GROUP BY 1),
             |dev AS (
             |  SELECT o.o_orderpriority AS p, m.med,
             |    ABS(o.o_totalprice - m.med) AS dev
             |  FROM orders o JOIN med m ON o.o_orderpriority = m.p),
             |mad AS (
             |  SELECT p, percentile_cont(0.5) WITHIN GROUP (ORDER BY dev) AS mad
             |  FROM dev GROUP BY 1)
             |SELECT d.p AS priority, MAX(d.med) AS med, MAX(a.mad) AS mad,
             |  COUNT(*) AS n,
             |  COUNT(*) FILTER (WHERE d.dev > 3.0 * 1.4826 * a.mad) AS n_out
             |FROM dev d JOIN mad a ON d.p = a.p
             |GROUP BY 1""".stripMargin)),

    // Declarative constraint audit (operators/Quality): the pre-promotion
    // check suite — PK uniqueness, completeness, accepted domains, value
    // ranges, referential integrity — as ONE aggregation per table plus
    // one anti-join, exploded into a (check, violations, total) report.
    Q("p08_constraint_audit",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.operators.Quality.audit(t.orders, t.lineitem)
      },
      Some(graft.operators.Quality.auditSql)),

    // Seasonal decomposition on the daily revenue series — trend via a
    // 7-day centered window, seasonality as the mean per-weekday deviation.
    // Engine-exact trick: instead of value − avg7 (a decimal division with
    // engine-specific scale rules), the deviation is 7·value − sum7 —
    // pure decimal ring arithmetic, bit-identical everywhere; only the
    // final per-weekday mean divides (double of exact sums). The window
    // runs over the PRE-AGGREGATED day series (|days| rows at any corpus
    // scale), so the unpartitioned ordering is driver-scale tiny — the
    // fact stream itself only ever passes one grouped aggregation.
    Q("q47_seasonal_decompose",
      (s, dir) => {
        val t = Tables(s, dir)
        val daily = t.orders
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("sv"))
        val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
        daily
          .withColumn("sum7", sum(col("sv")).over(w7))
          .withColumn("cnt7", count(lit(1)).over(w7))
          .filter(col("cnt7") === 7)
          .withColumn("dev7", col("sv") * 7 - col("sum7"))
          .groupBy(dayofweek(col("day")).cast("long").as("weekday"))
          .agg(count(lit(1)).as("n_days"),
            (sum(col("dev7")).cast("double") / count(lit(1))).as("mean_dev7"),
            (sum(col("sv")).cast("double") / count(lit(1))).as("mean_revenue"))
      },
      Some(s"""WITH daily AS (
              |  SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n,
              |    SUM(${sqlDec("o_totalprice")}) AS sv
              |  FROM orders GROUP BY 1),
              |win AS (
              |  SELECT day, sv,
              |    SUM(sv) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
              |      AND 3 FOLLOWING) AS sum7,
              |    COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
              |      AND 3 FOLLOWING) AS cnt7
              |  FROM daily)
              |SELECT dayofweek(day) + 1 AS weekday, COUNT(*) AS n_days,
              |  CAST(SUM(sv * 7 - sum7) AS DOUBLE) / COUNT(*) AS mean_dev7,
              |  CAST(SUM(sv) AS DOUBLE) / COUNT(*) AS mean_revenue
              |FROM win WHERE cnt7 = 7 GROUP BY 1""".stripMargin)),

    // Hierarchy flattening (GraphRank.flattenHierarchy): transitive
    // closure with depth over a parent-pointer relation — the recursive-
    // CTE workload (category trees, BOM containment, reply threads) solved
    // by log-round pointer doubling, since Spark has no WITH RECURSIVE.
    // Synthetic tree: part p's parent is p DIV 10 (≈4 levels at sf0.01).
    // The oracle walks the same chain with a real recursive CTE.
    Q("q46_hierarchy_flatten",
      (s, dir) => {
        val t = Tables(s, dir)
        val edges = t.part.filter(col("p_partkey") >= 10)
          .select(col("p_partkey").as("child"),
            expr("p_partkey DIV 10").as("parent"))
        graft.operators.GraphRank.flattenHierarchy(edges, "child", "parent")
      },
      Some(graft.operators.GraphRank.flattenHierarchySql(
        "SELECT p_partkey AS child, p_partkey // 10 AS parent FROM part WHERE p_partkey >= 10"))),

    // Functional-dependency discovery: test candidate X→Y dependencies by
    // counting determinant values with >1 distinct dependent — the schema-
    // inference pass that finds real keys and denormalization opportunities
    // in an unfamiliar drop. Each candidate is one map-side-combined
    // aggregation on its determinant; candidates over the same determinant
    // share a shuffle. Exact violation counts, so the verdict is a fact,
    // not a sample.
    Q("p10_fd_discovery",
      (s, dir) => {
        val t = Tables(s, dir)
        val nat = t.nation.select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
        val li = t.lineitem.select(col("l_orderkey"), col("l_partkey"),
          col("l_suppkey"), col("l_shipdate"))
        def fd(df: org.apache.spark.sql.DataFrame, x: String, y: String) = df
          .groupBy(col(x)).agg(countDistinct(col(y)).as("nd"))
          .agg(count(lit(1)).as("n_keys"),
            sum((col("nd") > 1).cast("long")).as("n_violating"))
          .select(lit(s"$x->$y").as("fd"), col("n_keys"), col("n_violating"),
            (col("n_violating") === 0).as("holds"))
        fd(nat, "n_nationkey", "n_regionkey")
          .unionByName(fd(nat, "n_regionkey", "n_name"))
          .unionByName(fd(li, "l_orderkey", "l_shipdate"))
          .unionByName(fd(li, "l_partkey", "l_suppkey"))
      },
      Some {
        def fd(table: String, x: String, y: String) =
          s"""SELECT '$x->$y' AS fd, COUNT(*) AS n_keys,
             |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
             |  CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) = 0 AS holds
             |FROM (SELECT $x, COUNT(DISTINCT $y) AS nd FROM $table GROUP BY 1)""".stripMargin
        Seq(fd("nation", "n_nationkey", "n_regionkey"),
          fd("nation", "n_regionkey", "n_name"),
          fd("lineitem", "l_orderkey", "l_shipdate"),
          fd("lineitem", "l_partkey", "l_suppkey")).mkString("\nUNION ALL\n")
      }),

    // Incremental (mergeable) profile: per-month summaries of `orders` —
    // count/min/max plus a bottom-k KMV heap of distinct customer hashes —
    // merged into one profile row WITHOUT rescanning raw data. Per-part
    // heaps merge losslessly (bottom-k of a union = bottom-k of the union
    // of bottom-ks), so the merged distinct estimate is identical to
    // profiling the whole table directly — exactly what the oracle
    // replays. The 100 TB stats-maintenance shape: each ingest batch
    // persists one summary row; refreshes aggregate summaries only.
    Q("p11_incremental_profile",
      (s, dir) => {
        val t = Tables(s, dir)
        val k = 1024
        val summ = graft.operators.Profiler.incrementalSummaries(
          t.orders, date_format(col("o_orderdate"), "yyyy-MM"),
          "o_totalprice", "o_custkey", k)
        graft.operators.Profiler.mergeSummaries(summ, k)
      },
      Some(graft.operators.Profiler.incrementalProfileSql(
        "orders", "strftime(o_orderdate, '%Y-%m')", "o_totalprice",
        "o_custkey", 1024))),

    // Time-weighted average price (TWAP) per (event_type, day): each
    // observation weighted by its holding interval to the next observation
    // (exact µs deltas; the day's last interval has no successor and drops
    // out — the standard open-interval TWAP). value·Δt products accumulate
    // in DECIMAL, so the division is a deterministic function of exact
    // sums. ONE window shuffle on (type, day) feeds both the lead() and
    // the final aggregation.
    Q("q45_twap",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("event_type"), col("day"))
          .orderBy(col("ts").asc, col("event_id").asc)
        t.events
          .withColumn("day", to_date(col("ts")))
          .withColumn("dt_us", unix_micros(lead(col("ts"), 1).over(w)) -
            unix_micros(col("ts")))
          .filter(col("dt_us").isNotNull)
          .groupBy(col("event_type"), col("day"))
          .agg(
            sum(dec(col("value")) * col("dt_us")).as("vt"),
            sum(col("dt_us")).as("tt"),
            count(lit(1)).as("n_intervals"))
          .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            (col("vt").cast("double") / col("tt").cast("double")).as("twap"),
            col("n_intervals"))
      },
      Some(s"""WITH seq AS (
              |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
              |    value,
              |    epoch_us(LEAD(ts) OVER (PARTITION BY event_type,
              |        CAST(date_trunc('day', ts) AS DATE)
              |      ORDER BY ts ASC, event_id ASC)) - epoch_us(ts) AS dt_us
              |  FROM events),
              |agg AS (
              |  SELECT event_type, day,
              |    SUM(${sqlDec("value")} * dt_us) AS vt,
              |    SUM(dt_us) AS tt, COUNT(*) AS n_intervals
              |  FROM seq WHERE dt_us IS NOT NULL GROUP BY 1, 2)
              |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
              |  CAST(vt AS DOUBLE) / CAST(tt AS DOUBLE) AS twap,
              |  CAST(n_intervals AS BIGINT) AS n_intervals
              |FROM agg""".stripMargin)),

    // Distribution-drift gate (Profiler.distDrift): chi-square per-bucket
    // drift of order totals between the pre-1997 reference slice and the
    // rest — 10 exact-cent buckets pinned to the reference range, add-one
    // smoothed shares. Chi-square, not PSI: ln() is not bit-portable
    // across engines, IEEE ·/÷ are. Per-bucket terms keep the output
    // order-independent.
    Q("p09_dist_drift",
      (s, dir) => {
        val t = Tables(s, dir)
        val refPred = col("o_orderdate") < "1997-01-01"
        graft.operators.Profiler.distDrift(
          t.orders.filter(refPred), t.orders.filter(!refPred), "o_totalprice")
      },
      Some(graft.operators.Profiler.distDriftSql(
        "orders", "o_totalprice", "o_orderdate < '1997-01-01'"))),

    // Exact two-sample Kolmogorov–Smirnov distance on the same slices as
    // p09 — the binning-free drift gate. Integer sup numerator over the
    // common n1*n2 denominator (no float until the one display division);
    // the global cumulative counts run through PrefixSum.runningSums —
    // range-bucketed two-level prefix sums, never a single-partition
    // window.
    Q("p17_ks_two_sample",
      (s, dir) => {
        val t = Tables(s, dir)
        val refPred = col("o_orderdate") < "1997-01-01"
        graft.operators.KsTest.ksTwoSampleTagged(
          t.orders, "o_totalprice", refPred)
      },
      Some(graft.operators.KsTest.ksTwoSampleSql(
        "orders", "o_totalprice", "o_orderdate < '1997-01-01'"))),

    // Exact Gini coefficient of order revenue — the concentration
    // diagnostic (token-budget-per-source / revenue-per-commodity shape).
    // Pairwise |xi−xj| collapsed by sorted distinct value over PrefixSum
    // cumulatives; integer/decimal-exact numerator (HUGEINT in the
    // oracle), one display division.
    Q("p18_gini_concentration",
      (s, dir) => graft.operators.Gini.ofColumn(
        Tables(s, dir).orders, "o_totalprice"),
      Some(graft.operators.Gini.ofColumnSql("orders", "o_totalprice"))),

    // Snapshot diff / CDC delta (ingest.Upsert.snapshotDiff): two synthetic
    // versions of `orders` (drop-by-modulus membership churn + deterministic
    // price/status edits) compared into the added/removed/changed delta an
    // incremental consumer applies. One full outer join on the key — the
    // minimal shuffle any snapshot compare pays; bucketed snapshots (b01's
    // layout) would eliminate even that exchange.
    Q("q43_snapshot_diff",
      (s, dir) => {
        val t = Tables(s, dir)
        val base = t.orders.select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice"))
        val old = base.filter(pmod(col("o_orderkey"), lit(7)) =!= 0)
        val newer = base.filter(pmod(col("o_orderkey"), lit(5)) =!= 0)
          .withColumn("o_totalprice",
            when(pmod(col("o_orderkey"), lit(3)) === 0,
              col("o_totalprice") + lit(100.0)).otherwise(col("o_totalprice")))
          .withColumn("o_orderstatus",
            when(pmod(col("o_orderkey"), lit(11)) === 0, lit("X"))
              .otherwise(col("o_orderstatus")))
        graft.ingest.Upsert.snapshotDiff(old, newer, Seq("o_orderkey"),
          Seq("o_orderstatus", "o_totalprice"))
      },
      Some(graft.ingest.Upsert.snapshotDiffSql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0",
        """SELECT o_orderkey,
          |  CASE WHEN o_orderkey % 11 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
          |  CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 100.0
          |       ELSE o_totalprice END AS o_totalprice
          |FROM orders WHERE o_orderkey % 5 <> 0""".stripMargin,
        Seq("o_orderkey"), Seq("o_orderstatus", "o_totalprice")))),

    // Per-group OLS regression: slope/intercept of extendedprice on
    // quantity per brand, from the five exact split-sums (q33's technique —
    // BIGINT integer part + exact decimal fraction, recombined in double
    // with the identical expression tree in both engines). ONE aggregation
    // over the broadcast-joined fact stream; the closed-form normal
    // equations never materialize anything wider than 25 brand rows.
    Q("q44_brand_regression",
      (s, dir) => {
        val t = Tables(s, dir)
        def d2(c: String) = col(c).cast("decimal(9,2)")
        def splitSum(e: Column, name: String): Seq[Column] = Seq(
          sum(floor(e).cast("long")).as(name + "i"),
          sum(e - floor(e)).as(name + "f"))
        val joined = t.lineitem.join(broadcast(t.part),
          col("l_partkey") === col("p_partkey"))
        val aggs: Seq[Column] = Seq(count(lit(1)).as("n")) ++
          splitSum(d2("l_quantity"), "sx") ++
          splitSum(d2("l_quantity") * d2("l_quantity"), "sx2") ++
          splitSum(d2("l_extendedprice"), "sy") ++
          splitSum(d2("l_quantity") * d2("l_extendedprice"), "sxy")
        val sums = joined.groupBy(col("p_brand")).agg(aggs.head, aggs.tail: _*)
        def big(name: String): Column =
          col(name + "i").cast("double") + col(name + "f").cast("double")
        val nd = col("n").cast("double")
        val (sx, sx2, sy, sxy) = (big("sx"), big("sx2"), big("sy"), big("sxy"))
        val slope = (nd * sxy - sx * sy) / (nd * sx2 - sx * sx)
        sums.select(col("p_brand"), col("n"), slope.as("slope"),
          ((sy - slope * sx) / nd).as("intercept"))
      },
      Some {
        def splitSum(e: String, name: String) =
          s"SUM(CAST(floor($e) AS BIGINT)) AS ${name}i, SUM(($e) - floor($e)) AS ${name}f"
        def big(name: String) = s"(CAST(${name}i AS DOUBLE) + CAST(${name}f AS DOUBLE))"
        val (x, y) = ("CAST(l_quantity AS DECIMAL(9,2))",
          "CAST(l_extendedprice AS DECIMAL(9,2))")
        val n = "CAST(n AS DOUBLE)"
        val (sx, sx2, sy, sxy) = (big("sx"), big("sx2"), big("sy"), big("sxy"))
        val slope = s"(($n * $sxy - $sx * $sy) / ($n * $sx2 - $sx * $sx))"
        s"""WITH sums AS (
           |  SELECT p_brand, COUNT(*) AS n,
           |    ${splitSum(x, "sx")},
           |    ${splitSum(s"$x * $x", "sx2")},
           |    ${splitSum(y, "sy")},
           |    ${splitSum(s"$x * $y", "sxy")}
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  GROUP BY 1)
           |SELECT p_brand, n, $slope AS slope,
           |  (($sy - $slope * $sx) / $n) AS intercept
           |FROM sums""".stripMargin
      }),

    // Time-decay weighted aggregate: per event type, Σ value·0.9^age_days
    // against a fixed as-of date — the recency weighting every freshness-
    // sensitive rollup (engagement scores, retrain mixes) applies. The
    // decay powers are a 60-row LITERAL lookup table (0.9^d pre-rounded to
    // 12 decimal places in Scala and embedded in BOTH plans), so the
    // weighted sum is pure decimal arithmetic — exact, order-independent,
    // engine-identical; no pow() enters the dataflow. Shape: broadcast the
    // tiny weight table against the narrow event scan, one aggregation.
    Q("q49_time_decay",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val weights = (0 until 60)
          .map(d => (d.toLong, new java.math.BigDecimal("0.9").pow(d)
            .setScale(12, java.math.RoundingMode.HALF_UP).toPlainString))
          .toDF("age_d", "w_str")
          .select(col("age_d"), col("w_str").cast("decimal(14,12)").as("w"))
        t.events
          .select(col("event_type"), col("value"),
            datediff(lit("2024-01-31").cast("date"), to_date(col("ts"))).cast("long").as("age_d"))
          .join(broadcast(weights), Seq("age_d"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            // emit exact integer CENTS: the scale-14 decimal sum is exact
            // in both engines, but a double cast can differ in the last
            // ulp and a scale-2 re-round hits engine rounding-mode
            // differences on .xx5 boundaries — floor(100×sum) does neither
            floor(sum(dec(col("value")) * col("w")) * lit(100))
              .cast("long").as("decayed_cents"))
      },
      Some {
        val rows = (0 until 60)
          .map(d => s"($d, CAST('${new java.math.BigDecimal("0.9").pow(d)
            .setScale(12, java.math.RoundingMode.HALF_UP).toPlainString}' AS DECIMAL(14,12)))")
          .mkString(", ")
        s"""WITH weights(age_d, w) AS (VALUES $rows),
           |aged AS (
           |  SELECT event_type, value,
           |    date_diff('day', CAST(ts AS DATE), DATE '2024-01-31') AS age_d
           |  FROM events)
           |SELECT event_type, COUNT(*) AS n,
           |  CAST(floor(SUM(${sqlDec("value")} * w) * 100) AS BIGINT)
           |    AS decayed_cents
           |FROM aged JOIN weights USING (age_d)
           |GROUP BY event_type""".stripMargin
      }),

    // Explicit GROUPING SETS (Dataset.groupingSets, Spark 4): an IRREGULAR
    // set list — two independent single-column breakdowns, no combined
    // cell, no grand total — which neither rollup nor cube can express
    // (they'd compute strictly more cells that then need filtering). One
    // Expand of factor 2 + one hash agg; grouping_id disambiguates which
    // breakdown a row belongs to (a genuinely NULL key vs a rolled-up one).
    Q("q50_grouping_sets",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .groupingSets(
            Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
            col("o_orderpriority"), col("o_orderstatus"))
          .agg(
            (grouping(col("o_orderpriority")) * 2 +
              grouping(col("o_orderstatus"))).cast("int").as("gid"),
            count(lit(1)).as("n"),
            sumd(col("o_totalprice")).as("sum_price"))
      },
      Some(s"""SELECT o_orderpriority, o_orderstatus,
              |  CAST(GROUPING(o_orderpriority)*2 + GROUPING(o_orderstatus) AS INTEGER) AS gid,
              |  COUNT(*) AS n, ${sqlSumd("o_totalprice")} AS sum_price
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin)),

    // The remaining window-NAVIGATION surface in one query (q26 covers
    // lead/lag/ntile; q05/q11 cover running/ranking): percent_rank,
    // cume_dist, nth_value over an explicit cumulative ROWS frame, and a
    // centered 3-row moving average. Ordering is pinned unique by
    // (price, orderkey) so every rank-derived value is deterministic, and
    // frames are written out explicitly — default-frame semantics for
    // nth_value differ subtly across engines. The moving average divides
    // in DOUBLE on both sides (decimal division would widen scale
    // engine-specifically).
    Q("q52_window_navigation",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        val wf = w.rowsBetween(Long.MinValue, 0)
        val wc = w.rowsBetween(-1, 1)
        t.orders.select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          nth_value(col("o_totalprice"), 2).over(wf).as("second_lowest"),
          (sum(dec(col("o_totalprice"))).over(wc).cast("double") /
            count(lit(1)).over(wc)).as("centered_avg"))
      },
      Some(s"""SELECT o_orderkey, o_orderpriority,
              |  percent_rank() OVER w AS pr,
              |  cume_dist() OVER w AS cd,
              |  nth_value(o_totalprice, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_lowest,
              |  CAST(SUM(${sqlDec("o_totalprice")}) OVER (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
              |    / (COUNT(*) OVER (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)) AS centered_avg
              |FROM orders
              |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)""".stripMargin)),

    // JOIN-SIZE estimation from two CountMin sketches — the cardinality
    // question a cost-based optimizer asks before picking a join strategy,
    // answered from two depth×width summaries WITHOUT touching either
    // table again: |A ⋈ B| = Σ_k fA(k)·fB(k), min over rows of the per-row
    // cell inner product. Never undercounts; the additive error is
    // ~|A|·|B|/width (production widths are 2^20+, the declared 4096 keeps
    // the oracle replay cheap). Emitted next to the exact join count so
    // the bound is visible in the result itself.
    Q("p15_join_size_estimate",
      (s, dir) => {
        val depth = 4; val width = 4096
        val t = Tables(s, dir)
        val cm = graft.operators.CountMin
        val est = cm.joinSizeEstimate(
          cm.sketch(t.orders.select(col("o_orderkey").cast("string").as("tok")),
            "tok", depth, width),
          cm.sketch(t.lineitem.select(col("l_orderkey").cast("string").as("tok")),
            "tok", depth, width))
        val exact = t.orders
          .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
          .agg(count(lit(1)).as("exact_join_size"))
        est.crossJoin(broadcast(exact))
      },
      Some {
        val depth = 4; val width = 4096
        val cm = graft.operators.CountMin
        s"""WITH otoks AS (SELECT CAST(o_orderkey AS VARCHAR) AS tok FROM orders),
           |ltoks AS (SELECT CAST(l_orderkey AS VARCHAR) AS tok FROM lineitem),
           |ska AS (${cm.sketchSql("otoks", depth, width)}),
           |skb AS (${cm.sketchSql("ltoks", depth, width)}),
           |est AS (${cm.joinSizeEstimateSql("ska", "skb")}),
           |exact AS (
           |  SELECT COUNT(*) AS exact_join_size
           |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
           |SELECT est_join_size, exact_join_size FROM est, exact""".stripMargin
      }),

    // Mode + DISCRETE median per group (q15's percentile_cont interpolates;
    // percentile_disc returns an actual element). Both engines' builtins
    // (Spark mode(), DuckDB quantile_disc) leave tie/rounding semantics
    // engine-defined, so both stats are pinned by explicit arithmetic:
    // mode = argmax of (count, smallest-value-on-tie) via one packed-BIGINT
    // max_by over the frequency relation; disc median = the value at rank
    // ceil(n/2) of the sorted multiset (row_number + count window, value at
    // a rank is well-defined regardless of tie order). Values ride as exact
    // integer cents.
    Q("q51_mode_disc_median",
      (s, dir) => {
        val t = Tables(s, dir)
        val cents = t.lineitem.select(col("l_returnflag").as("f"),
          (dec(col("l_quantity")) * 100).cast("long").as("c"))
        val mode = cents.groupBy(col("f"), col("c"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("f"))
          .agg(max_by(col("c"), col("cnt") * 1000000L - col("c")).as("mc"),
            max(col("cnt")).as("n_modal"))
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy(col("f")).orderBy(col("c"))
        val wn = org.apache.spark.sql.expressions.Window.partitionBy(col("f"))
        val med = cents
          .withColumn("rn", row_number().over(wr).cast("long"))
          .withColumn("n", count(lit(1)).over(wn))
          // DIV, not `/`: Column./ is double division, and an even-count
          // group's (n+1)/2 = x.5 would match no rank at all
          .filter(col("rn") === expr("(n + 1) DIV 2"))
          .select(col("f"), col("c").as("medc"))
        mode.join(med, Seq("f"))
          .select(col("f").as("l_returnflag"),
            (col("mc").cast("double") / 100).as("modal_qty"), col("n_modal"),
            (col("medc").cast("double") / 100).as("median_qty"))
      },
      Some(s"""WITH cents AS (
              |  SELECT l_returnflag AS f,
              |    CAST(${sqlDec("l_quantity")} * 100 AS BIGINT) AS c
              |  FROM lineitem),
              |freq AS (SELECT f, c, COUNT(*) AS cnt FROM cents GROUP BY 1, 2),
              |md AS (
              |  SELECT f, arg_max(c, cnt * 1000000 - c) AS mc,
              |    MAX(cnt) AS n_modal
              |  FROM freq GROUP BY 1),
              |ranked AS (
              |  SELECT f, c, ROW_NUMBER() OVER (PARTITION BY f ORDER BY c) AS rn,
              |    COUNT(*) OVER (PARTITION BY f) AS n
              |  FROM cents),
              |med AS (SELECT f, c AS medc FROM ranked WHERE rn = (n + 1) // 2)
              |SELECT md.f AS l_returnflag, CAST(md.mc AS DOUBLE) / 100 AS modal_qty,
              |  md.n_modal, CAST(med.medc AS DOUBLE) / 100 AS median_qty
              |FROM md JOIN med ON md.f = med.f""".stripMargin)),

    // KMV sketch SET ALGEBRA: per-source bottom-k summaries support not
    // just distinct counts but union / intersection / Jaccard estimates
    // between any source pair — the "how much does corpus A overlap corpus
    // B" question answered from k-hash summaries instead of a doc-level
    // join. One corpus pass builds the 20 summary rows (bounded heaps,
    // map-side combine: the exchange carries ≤ k hashes per source per
    // partition); the pairwise algebra then runs on a 20-row relation with
    // array functions — at 100 TB the sketches are persisted once per
    // ingest batch and every cross-corpus overlap query is sketch-only.
    // Unsaturated sketches (cnt < k) are complete hash sets, so those
    // pairs fall back to EXACT set arithmetic; the estimator paths use the
    // standard KMV forms: est = (k-1)/h_(k), rho = |K ∩ A ∩ B| / k,
    // inter = rho * union.
    Q("p12_sketch_set_ops",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val k = 16
        val hashed = t.documents
          .select(col("source"),
            graft.functions.TextFns.md5Hash32(col("text")).as("h"))
          .distinct()
        val sk = hashed.as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(new graft.operators.BottomKSummary(k).toColumn.name("s"))
          .toDF("source", "s")
          .select(col("source"), col("s._1").as("cnt"), col("s._2").as("sk"))
        // try_element_at (NOT element_at: ANSI mode is Spark 4's default
        // and plain element_at throws out-of-bounds) is null below k
        // elements — exactly the shared estimator's unsaturated guard
        def est(cnt: Column, skc: Column): Column =
          graft.operators.Kmv.estimate(k, cnt, try_element_at(skc, lit(k)))
        val pairs = sk.select(col("source").as("source_a"),
            col("cnt").as("cnt_a"), col("sk").as("sk_a"))
          .join(sk.select(col("source").as("source_b"),
            col("cnt").as("cnt_b"), col("sk").as("sk_b")),
            col("source_a") < col("source_b"))
        val complete = col("cnt_a") < k && col("cnt_b") < k
        pairs
          .withColumn("u", array_sort(array_union(col("sk_a"), col("sk_b"))))
          .withColumn("est_a", est(col("cnt_a"), col("sk_a")))
          .withColumn("est_b", est(col("cnt_b"), col("sk_b")))
          .withColumn("est_union",
            when(complete, size(col("u")).cast("double"))
              .otherwise(est(size(col("u")).cast("long"), col("u"))))
          .withColumn("est_inter",
            when(complete,
              size(array_intersect(col("sk_a"), col("sk_b"))).cast("double"))
              .otherwise(
                size(filter(slice(col("u"), 1, k), x =>
                  array_contains(col("sk_a"), x) &&
                    array_contains(col("sk_b"), x))).cast("double") *
                  col("est_union") / lit(k.toDouble)))
          .withColumn("jaccard_est", col("est_inter") / col("est_union"))
          .select(col("source_a"), col("source_b"), col("cnt_a"), col("cnt_b"),
            col("est_a"), col("est_b"), col("est_union"), col("est_inter"),
            col("jaccard_est"))
      },
      Some(s"""WITH hashed AS (
              |  SELECT DISTINCT source,
              |    ${graft.functions.TextFns.md5Hash32Sql("text")} AS h
              |  FROM documents),
              |cnts AS (SELECT source, COUNT(*) AS cnt FROM hashed GROUP BY 1),
              |ranked AS (
              |  SELECT source, h,
              |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
              |  FROM hashed),
              |sks AS (
              |  SELECT source, list(h ORDER BY h) AS sk
              |  FROM ranked WHERE rn <= 16 GROUP BY 1),
              |summ AS (
              |  SELECT c.source, c.cnt, sks.sk FROM cnts c JOIN sks USING (source)),
              |pairs AS (
              |  SELECT a.source AS source_a, b.source AS source_b,
              |    a.cnt AS cnt_a, b.cnt AS cnt_b, a.sk AS sk_a, b.sk AS sk_b,
              |    list_sort(list_distinct(list_concat(a.sk, b.sk))) AS u
              |  FROM summ a JOIN summ b ON a.source < b.source),
              |ests AS (
              |  SELECT *,
              |    CASE WHEN cnt_a < 16 THEN CAST(cnt_a AS DOUBLE)
              |      ELSE 15.0 / (CAST(sk_a[16] AS DOUBLE) / 4294967296.0) END AS est_a,
              |    CASE WHEN cnt_b < 16 THEN CAST(cnt_b AS DOUBLE)
              |      ELSE 15.0 / (CAST(sk_b[16] AS DOUBLE) / 4294967296.0) END AS est_b,
              |    CASE WHEN cnt_a < 16 AND cnt_b < 16 THEN CAST(len(u) AS DOUBLE)
              |      ELSE 15.0 / (CAST(u[16] AS DOUBLE) / 4294967296.0) END AS est_union
              |  FROM pairs),
              |inters AS (
              |  SELECT *,
              |    CASE WHEN cnt_a < 16 AND cnt_b < 16
              |      THEN CAST(len(list_intersect(sk_a, sk_b)) AS DOUBLE)
              |      ELSE CAST(len(list_filter(u[1:16], x ->
              |          list_contains(sk_a, x) AND list_contains(sk_b, x)))
              |        AS DOUBLE) * est_union / 16.0 END AS est_inter
              |  FROM ests)
              |SELECT source_a, source_b, cnt_a, cnt_b, est_a, est_b,
              |  est_union, est_inter, est_inter / est_union AS jaccard_est
              |FROM inters""".stripMargin)),
  )
}
