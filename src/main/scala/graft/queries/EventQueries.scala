package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.util.Tables

/** Batch queries over the `events` table exercising the streaming-shaped
  * surface (SURVEY.md §2.9): tumbling/sliding windows, session windows
  * (gaps-and-islands), as-of enrichment, JSON props extraction. The same
  * operators run under Structured Streaming in graft.streaming; these batch
  * forms are the DuckDB-oracled versions.
  */
object EventQueries {
  import Num._

  private val TsFmtSpark = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val TsFmtDuck = "%Y-%m-%d %H:%M:%S.%f"

  val all: Seq[Q] = Seq(
    // ST5-analog tumbling window (epoch-aligned 1h buckets).
    Q("s01_hourly_tumbling",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
          .select(date_format(col("ws"), TsFmtSpark).as("window_start"),
            col("event_type"), col("n"), col("sum_value"))
      },
      Some(s"""SELECT strftime(date_trunc('hour', ts), '$TsFmtDuck') AS window_start,
              |  event_type, COUNT(*) AS n, ${sqlSumd("value")} AS sum_value
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // Interval (stream-stream) join, batch twin of EventStreams.joinWithin:
    // every (purchase, click) pair of the same user with the click in the
    // 30 minutes up to the purchase. At scale both sides shuffle once on
    // user_id and the time predicate prunes within the key group — the
    // batch shape of a watermarked stream-stream join's state bound.
    Q("s09_interval_join",
      (s, dir) => {
        val t = Tables(s, dir)
        val purchases = t.events.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("pts"))
        val clicks = t.events.filter(col("event_type") === "click")
          .select(col("user_id").as("cuid"), col("ts").as("cts"))
        purchases.join(clicks,
            col("user_id") === col("cuid") &&
              col("cts") >= col("pts") - expr("INTERVAL 30 MINUTES") &&
              col("cts") <= col("pts"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_pairs"),
            date_format(max(col("cts")), TsFmtSpark).as("last_click"))
      },
      Some(s"""SELECT p.user_id, COUNT(*) AS n_pairs,
              |  strftime(MAX(c.ts), '$TsFmtDuck') AS last_click
              |FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
              |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
              |  ON p.user_id = c.user_id
              | AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
              |GROUP BY p.user_id""".stripMargin)),

    // Sliding window: 2h wide, 1h slide — each event lands in two windows.
    Q("s02_sliding_2h",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .groupBy(window(col("ts"), "2 hours", "1 hour").getField("start").as("ws"))
          .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
          .select(date_format(col("ws"), TsFmtSpark).as("window_start"),
            col("n"), col("sum_value"))
      },
      Some(s"""WITH w AS (
              |  SELECT unnest([date_trunc('hour', ts),
              |                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws,
              |         value
              |  FROM events)
              |SELECT strftime(ws, '$TsFmtDuck') AS window_start,
              |  COUNT(*) AS n, ${sqlSumd("value")} AS sum_value
              |FROM w GROUP BY 1""".stripMargin)),

    // Session windows per user with a 30-minute inactivity gap —
    // gaps-and-islands: flag session starts via lag, running-sum the flags
    // into session ids, aggregate bounds. Deterministic ordering via
    // (ts, event_id).
    Q("s03_session_windows",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val gapUs = 30L * 60 * 1000000
        val flagged = t.events.withColumn("new_sess",
          when(unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > gapUs, 1)
            .otherwise(0))
        flagged
          .withColumn("sess_id",
            sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(
            date_format(min(col("ts")), TsFmtSpark).as("session_start"),
            date_format(max(col("ts")), TsFmtSpark).as("session_end"),
            count(lit(1)).as("n_events"))
      },
      Some(s"""WITH flagged AS (
              |  SELECT user_id, event_id, ts,
              |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
              |      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              |      THEN 1 ELSE 0 END AS new_sess
              |  FROM events),
              |sess AS (
              |  SELECT user_id, ts,
              |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
              |  FROM flagged)
              |SELECT user_id, sess_id,
              |  strftime(MIN(ts), '$TsFmtDuck') AS session_start,
              |  strftime(MAX(ts), '$TsFmtDuck') AS session_end,
              |  COUNT(*) AS n_events
              |FROM sess GROUP BY 1, 2""".stripMargin)),

    // As-of enrichment: each event gets its user's latest order at or before
    // the event time (backward as-of join, deterministic tiebreak).
    Q("s04_asof_latest_order",
      (s, dir) => {
        val t = Tables(s, dir)
        AsOfJoin.backward(
          t.events.select(col("event_id"), col("user_id"), col("ts")),
          t.orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payloadCols = Seq("o_orderkey", "o_totalprice"),
          rightTiebreak = "o_orderkey")
          .select(col("event_id"), col("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT event_id, o_orderkey, o_totalprice FROM (
             |  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY e.event_id
             |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM events e LEFT JOIN orders o
             |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
             |WHERE rn = 1""".stripMargin)),

    // FORWARD as-of: the NEXT order at-or-after each event (s04 is the
    // backward twin). Same one-shuffle union+window composition, mirrored:
    // left rows sort before right at equal times (>= includes the tie) and
    // a forward-looking first(ignoreNulls) carries the match back.
    Q("s22_asof_next_order",
      (s, dir) => {
        val t = Tables(s, dir)
        AsOfJoin.forward(
          t.events.select(col("event_id"), col("user_id"), col("ts")),
          t.orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payloadCols = Seq("o_orderkey", "o_totalprice"),
          rightTiebreak = "o_orderkey")
          .select(col("event_id"), col("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT event_id, o_orderkey, o_totalprice FROM (
             |  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY e.event_id
             |      ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
             |  FROM events e LEFT JOIN orders o
             |    ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts)
             |WHERE rn = 1""".stripMargin)),

    // The built-in session_window operator in batch, checked against an
    // independent gaps-and-islands derivation in DuckDB (session end =
    // last event + gap, merged on 30-minute inactivity).
    Q("s08_session_window_builtin",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"),
            date_format(col("w.start"), TsFmtSpark).as("session_start"),
            date_format(col("w.end"), TsFmtSpark).as("session_end"),
            col("n_events"))
      },
      Some(s"""WITH flagged AS (
              |  SELECT user_id, event_id, ts,
              |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
              |      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
              |      THEN 1 ELSE 0 END AS new_sess
              |  FROM events),
              |sess AS (
              |  SELECT user_id, ts,
              |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |      ROWS UNBOUNDED PRECEDING) AS sess_id
              |  FROM flagged)
              |SELECT user_id,
              |  strftime(MIN(ts), '$TsFmtDuck') AS session_start,
              |  strftime(MAX(ts) + INTERVAL 30 MINUTE, '$TsFmtDuck') AS session_end,
              |  COUNT(*) AS n_events
              |FROM sess GROUP BY user_id, sess_id""".stripMargin)),

    // The same as-of semantics through the NATIVE custom operator
    // (LogicalPlan + Strategy + BinaryExecNode, graft.plans.AsOfJoinNative)
    // — shares s04's oracle, so the custom physical operator itself is
    // hash-checked against DuckDB.
    Q("s07_asof_native_operator",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.plans.AsOfJoinNative.backward(
          t.events.select(col("event_id"), col("user_id"), col("ts")),
          t.orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payloadCols = Seq("o_orderkey", "o_totalprice"),
          rightTiebreak = "o_orderkey")
          .select(col("event_id"), col("o_orderkey"), col("o_totalprice"))
      },
      Some("""SELECT event_id, o_orderkey, o_totalprice FROM (
             |  SELECT e.event_id, o.o_orderkey, o.o_totalprice,
             |    ROW_NUMBER() OVER (PARTITION BY e.event_id
             |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
             |  FROM events e LEFT JOIN orders o
             |    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
             |WHERE rn = 1""".stripMargin)),

    // J1-analog: JSON property extraction from the props column.
    Q("s05_json_props",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .withColumn("k_val", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy((col("k_val") % 10).as("k_bucket"))
          .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
      },
      Some(s"""SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) % 10 AS k_bucket,
              |  COUNT(*) AS n, ${sqlSumd("value")} AS sum_value
              |FROM events GROUP BY 1""".stripMargin)),

    // SCD Type-2 history: per-user event_type transitions become validity
    // intervals [valid_from, valid_to) with a version sequence — the
    // change-data-capture shape of the reference's "only re-scrape when the
    // page changed" contract, expressed relationally.
    Q("s10_scd2_history",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.ingest.Upsert.scd2(
          t.events.filter(col("user_id") < 50),
          keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
          attrs = Seq("event_type"))
      },
      Some(graft.ingest.Upsert.scd2Sql("events", Seq("user_id"), "ts",
        "event_id", Seq("event_type"), pred = "user_id < 50"))),

    // Calendar densification + LOCF (operators/GapFill): the daily-snapshot
    // series the reference lands has holes (failed scrapes, non-trading
    // days); every time-series consumer wants a dense calendar with flows
    // zero-filled and levels carried forward. Purchases for 20 users over
    // the global span — ~2/3 of the emitted days are introduced gaps.
    Q("s11_gap_fill_locf",
      (s, dir) => {
        val t = Tables(s, dir)
        val daily = t.events
          .filter(col("event_type") === "purchase" && col("user_id") < 20)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
        graft.operators.GapFill.denseLocf(daily, "user_id", "day", "n", "sum_value")
          .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"), col("sum_value"), col("locf_sum_value"), col("is_gap"))
      },
      Some(s"""WITH daily AS (
              |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
              |    COUNT(*) AS n, ${sqlSumd("value")} AS sum_value
              |  FROM events WHERE event_type = 'purchase' AND user_id < 20
              |  GROUP BY 1, 2),
              |span AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM daily),
              |cal AS (
              |  SELECT k.user_id,
              |    CAST(unnest(generate_series(CAST(s.dmin AS TIMESTAMP),
              |      CAST(s.dmax AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
              |  FROM (SELECT DISTINCT user_id FROM daily) k CROSS JOIN span s),
              |filled AS (
              |  SELECT c.user_id, c.day, COALESCE(d.n, 0) AS n, d.sum_value
              |  FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day)
              |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n, sum_value,
              |  LAST_VALUE(sum_value IGNORE NULLS) OVER (PARTITION BY user_id
              |    ORDER BY day ROWS UNBOUNDED PRECEDING) AS locf_sum_value,
              |  (n = 0) AS is_gap
              |FROM filled""".stripMargin)),

    // Linear-interpolation gap fill (GapFill.denseInterp): the level-series
    // companion to s11's LOCF — gap days take the time-weighted blend of
    // the surrounding observations; leading/trailing gaps honestly stay
    // null. Two carries over ONE key partitioning (exchange reused).
    Q("s17_gap_fill_interp",
      (s, dir) => {
        val t = Tables(s, dir)
        val daily = t.events
          .filter(col("event_type") === "purchase" && col("user_id") < 20)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
        graft.operators.GapFill.denseInterp(daily, "user_id", "day", "n", "sum_value")
          .select(col("user_id"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"), col("sum_value"), col("interp_sum_value"), col("is_gap"))
      },
      Some(s"""WITH daily AS (
              |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
              |    COUNT(*) AS n, ${sqlSumd("value")} AS sum_value
              |  FROM events WHERE event_type = 'purchase' AND user_id < 20
              |  GROUP BY 1, 2),
              |span AS (SELECT MIN(day) AS dmin, MAX(day) AS dmax FROM daily),
              |cal AS (
              |  SELECT k.user_id,
              |    CAST(unnest(generate_series(CAST(s.dmin AS TIMESTAMP),
              |      CAST(s.dmax AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
              |  FROM (SELECT DISTINCT user_id FROM daily) k CROSS JOIN span s),
              |filled AS (
              |  SELECT c.user_id, c.day, COALESCE(d.n, 0) AS n, d.sum_value
              |  FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day),
              |carried AS (
              |  SELECT user_id, day, n, sum_value,
              |    LAST_VALUE(sum_value IGNORE NULLS) OVER (PARTITION BY user_id
              |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS pv,
              |    LAST_VALUE(CASE WHEN sum_value IS NOT NULL THEN day END IGNORE NULLS)
              |      OVER (PARTITION BY user_id
              |      ORDER BY day ROWS UNBOUNDED PRECEDING) AS pd,
              |    FIRST_VALUE(sum_value IGNORE NULLS) OVER (PARTITION BY user_id
              |      ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
              |    FIRST_VALUE(CASE WHEN sum_value IS NOT NULL THEN day END IGNORE NULLS)
              |      OVER (PARTITION BY user_id
              |      ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
              |  FROM filled)
              |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n, sum_value,
              |  CASE WHEN sum_value IS NOT NULL THEN sum_value
              |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
              |         pv + (nv - pv) * (CAST(datediff('day', pd, day) AS DOUBLE) /
              |           CAST(datediff('day', pd, nd) AS DOUBLE))
              |  END AS interp_sum_value,
              |  (n = 0) AS is_gap
              |FROM carried""".stripMargin)),

    // Ordered conversion funnel (view -> click -> purchase): each stage's
    // timestamp is the user's FIRST event of that type AT OR AFTER the
    // previous stage's timestamp — the order-sensitive funnel, not three
    // independent mins. Three aggregations over the same user_id-keyed
    // relation (exchange reuse), conditional min(when) per stage; no
    // windows, no self-joins wider than user count.
    Q("s12_funnel",
      (s, dir) => {
        val t = Tables(s, dir)
        val ev = t.events.select(col("user_id"), col("event_type"), col("ts"))
        val v = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
        val c = ev.filter(col("event_type") === "click")
          .join(v, Seq("user_id"))
          .filter(col("ts") >= col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
        val p = ev.filter(col("event_type") === "purchase")
          .join(c, Seq("user_id"))
          .filter(col("ts") >= col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .agg(
            count(col("t_view")).as("n_view"),
            count(col("t_click")).as("n_view_click"),
            count(col("t_purchase")).as("n_view_click_purchase"))
      },
      Some("""WITH v AS (
             |  SELECT user_id, MIN(ts) AS t_view FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |c AS (
             |  SELECT e.user_id, MIN(e.ts) AS t_click
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |  WHERE e.event_type = 'click' AND e.ts >= v.t_view GROUP BY 1),
             |p AS (
             |  SELECT e.user_id, MIN(e.ts) AS t_purchase
             |  FROM events e JOIN c ON e.user_id = c.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click GROUP BY 1)
             |SELECT COUNT(v.t_view) AS n_view, COUNT(c.t_click) AS n_view_click,
             |  COUNT(p.t_purchase) AS n_view_click_purchase
             |FROM v LEFT JOIN c ON v.user_id = c.user_id
             |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin)),

    // Incremental rollup maintenance (Upsert.mergeRollup): the standing
    // daily rollup absorbs a late-arriving batch (event_id % 10 == 0 plays
    // the late slice) by merging two ALREADY-REDUCED relations — raw
    // history is never rescanned. The oracle computes the full rollup
    // directly, so the hash check IS the incremental == recompute proof.
    Q("s14_incremental_rollup",
      (s, dir) => {
        val t = Tables(s, dir)
        def rollup(df: org.apache.spark.sql.DataFrame) = df
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sum_value"))
        val ev = t.events
        val standing = rollup(ev.filter(pmod(col("event_id"), lit(10)) =!= 0))
        val late = rollup(ev.filter(pmod(col("event_id"), lit(10)) === 0))
        graft.ingest.Upsert.mergeRollup(standing, late,
            keys = Seq("event_type", "day"),
            sumCols = Seq("sum_value"), countCols = Seq("n"))
          .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n"), col("sum_value").cast("double").as("sum_value"))
      },
      Some(s"""SELECT event_type,
              |  strftime(CAST(date_trunc('day', ts) AS DATE), '%Y-%m-%d') AS day,
              |  COUNT(*) AS n, ${sqlSumd("value")} AS sum_value
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // Cohort retention: users cohorted by first-active day; cell
    // (cohort_day, days_since) counts users active that many days later.
    // Two aggs + one join, all keyed on user_id / (cohort, offset) —
    // the standard growth-analytics matrix, entirely shuffle-bounded by
    // |users| and |cohorts × offsets|.
    Q("s13_cohort_retention",
      (s, dir) => {
        val t = Tables(s, dir)
        val firstDay = t.events.groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("cohort_day"))
        val activeDays = t.events
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        activeDays.join(firstDay, Seq("user_id"))
          .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
            datediff(col("day"), col("cohort_day")).cast("long").as("days_since"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH first_day AS (
             |  SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS cohort_day
             |  FROM events GROUP BY 1),
             |active AS (
             |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
             |  FROM events)
             |SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
             |  datediff('day', f.cohort_day, a.day) AS days_since,
             |  COUNT(*) AS n_users
             |FROM active a JOIN first_day f ON a.user_id = f.user_id
             |GROUP BY 1, 2""".stripMargin)),

    // Skew-salted two-phase aggregation on the hot low-cardinality key
    // (event_type): phase 1 spreads each key across 16 salted partials so
    // no reducer owns a whole hot key, phase 2 merges 16 rows per key.
    // Decimal partials keep the merge exact, so the result hash-matches the
    // single-phase oracle.
    Q("q35_salted_skew_agg",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.util.Skew.saltedSumCount(t.events, col("event_type"),
            col("event_id"), Num.dec(col("value")), salts = 16)
          .select(col("key").as("event_type"),
            col("sum").cast("double").as("sum_value"), col("n"))
      },
      Some(s"""SELECT event_type, ${sqlSumd("value")} AS sum_value, COUNT(*) AS n
              |FROM events GROUP BY 1""".stripMargin)),

    // Batch twin of EventStreams.ohlcAgg (streaming OHLC bars): hourly
    // open/high/low/close of `value` per event type. Open/close are
    // min_by/max_by on unix_micros(ts) — unique in this data; compose the
    // event id into a packed key when timestamps can collide — ONE hash
    // aggregation, no window, no sort, the same declarative aggregates the
    // streaming form merges across micro-batches. High/low/open/close are
    // picked doubles (exact); no double is ever summed.
    Q("s15_ohlc_bars",
      (s, dir) => {
        val t = Tables(s, dir)
        t.events
          .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"),
            col("event_type"))
          .agg(
            min_by(col("value"), unix_micros(col("ts"))).as("open_v"),
            max(col("value")).as("high_v"),
            min(col("value")).as("low_v"),
            max_by(col("value"), unix_micros(col("ts"))).as("close_v"),
            count(lit(1)).as("n"))
          .select(date_format(col("ws"), TsFmtSpark).as("window_start"),
            col("event_type"), col("open_v"), col("high_v"), col("low_v"),
            col("close_v"), col("n"))
      },
      Some(s"""SELECT strftime(date_trunc('hour', ts), '$TsFmtDuck') AS window_start,
              |  event_type,
              |  arg_min(value, epoch_us(ts)) AS open_v,
              |  MAX(value) AS high_v,
              |  MIN(value) AS low_v,
              |  arg_max(value, epoch_us(ts)) AS close_v,
              |  COUNT(*) AS n
              |FROM events GROUP BY 1, 2""".stripMargin)),

    // First-order Markov transition matrix over per-user event sequences:
    // lead() pairs each event with the user's next one (total order —
    // ts tie-broken by event_id), one aggregation counts (from, to) cells,
    // and the per-from share lands as exact integer basis points (n·10⁴
    // floor-divided by the from-state total, reusing the count exchange via
    // a window over from_type). The sequence-mining primitive behind
    // next-action prediction features and session-model QA. Shuffle cost:
    // one user_id exchange (the lead) + one cell-count exchange — both keyed,
    // both map-side combined; state space (|types|²) stays tiny at any
    // corpus scale.
    Q("s16_event_transitions",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val cells = t.events
          .withColumn("to_type", lead(col("event_type"), 1).over(w))
          .filter(col("to_type").isNotNull)
          .groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        // integer-bp share needs SQL DIV, so the window lives in the expr
        cells
          .withColumn("share_bp",
            expr("n * 10000 DIV sum(n) OVER (PARTITION BY from_type)"))
          .select(col("from_type"), col("to_type"), col("n"), col("share_bp"))
      },
      Some("""WITH seq AS (
             |  SELECT event_type AS from_type,
             |    LEAD(event_type) OVER (PARTITION BY user_id
             |      ORDER BY ts ASC, event_id ASC) AS to_type
             |  FROM events),
             |cells AS (
             |  SELECT from_type, to_type, COUNT(*) AS n FROM seq
             |  WHERE to_type IS NOT NULL GROUP BY 1, 2)
             |SELECT from_type, to_type, n,
             |  CAST(n * 10000 // SUM(n) OVER (PARTITION BY from_type) AS BIGINT)
             |    AS share_bp
             |FROM cells""".stripMargin)),

    // Per-window approx-distinct users: the q24 KMV bottom-k sketch at
    // hourly window granularity — the batch twin of a streaming
    // distinct-users dashboard (the same deterministic md5 KMV merges in
    // a stateful stream; StreamingKmvSpec asserts stream ≡ batch). The
    // exchange carries ≤ k hashes per (window, partition), never the
    // distinct-user set itself.
    Q("s18_window_approx_distinct",
      (s, dir) => {
        import s.implicits._
        val t = Tables(s, dir)
        val k = 256
        val hashed = t.events
          .select(date_format(window(col("ts"), "1 hour").getField("start"),
              TsFmtSpark).as("window_start"), col("user_id"))
          .distinct()
          .select(col("window_start"), graft.functions.TextFns
            .md5Hash32(col("user_id").cast("string")).as("h"))
          .distinct()
        hashed.as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(new graft.operators.BottomKSketch(k).toColumn.name("kmv"))
          .toDF("window_start", "kmv")
          .select(col("window_start"),
            when(col("kmv._2").isNull, col("kmv._1").cast("double"))
              .otherwise(lit((k - 1).toDouble) /
                (col("kmv._2").cast("double") / lit(4294967296.0)))
              .as("est_users"),
            col("kmv._1").as("n_distinct_hashes"))
      },
      Some(s"""WITH hashed AS (
              |  SELECT DISTINCT strftime(date_trunc('hour', ts), '$TsFmtDuck')
              |      AS window_start,
              |    ${graft.functions.TextFns.md5Hash32Sql("CAST(user_id AS VARCHAR)")} AS h
              |  FROM events),
              |counts AS (
              |  SELECT window_start, COUNT(*) AS n_distinct_hashes
              |  FROM hashed GROUP BY 1),
              |kth AS (
              |  SELECT window_start, h AS kth FROM (
              |    SELECT window_start, h,
              |      ROW_NUMBER() OVER (PARTITION BY window_start ORDER BY h) AS rn
              |    FROM hashed) WHERE rn = 256)
              |SELECT counts.window_start,
              |  CASE WHEN kth IS NULL THEN CAST(n_distinct_hashes AS DOUBLE)
              |       ELSE CAST(255 AS DOUBLE) / (CAST(kth AS DOUBLE) / 4294967296.0)
              |  END AS est_users,
              |  n_distinct_hashes
              |FROM counts LEFT JOIN kth USING (window_start)""".stripMargin)),

    // Temporal (point-in-time) join: enrich each purchase with the SCD2
    // dimension version valid at the event's timestamp. Because SCD2
    // intervals tile [first_ts, inf) per key, a backward as-of join on
    // valid_from IS the interval lookup — so the native as-of operator
    // (one shuffle per side, sorted-merge, no range-explode) replaces the
    // generic inequality join a naive BETWEEN predicate would plan.
    // Tiebreak = version: among versions sharing valid_from (two changes at
    // the same ts) the highest version wins, exactly the row whose
    // [from, to) interval is non-empty.
    Q("s19_scd2_temporal_join",
      (s, dir) => {
        val t = Tables(s, dir)
        val scoped = t.events.filter(col("user_id") < 50)
        // both sides derive from the same `scoped` plan, so the right's
        // columns must be re-aliased (fresh ExprIds) or the custom join
        // node would see its key as a left-side attribute (self-join dedup
        // is an analyzer service that custom-assembled plans don't get)
        val dim = graft.ingest.Upsert.scd2(scoped,
            keys = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
            attrs = Seq("event_type"))
          .select(col("user_id").as("dim_user"), col("valid_from"),
            col("event_type").as("dim_type"), col("version"))
        val purchases = scoped.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.plans.AsOfJoinNative.backward(purchases, dim,
          leftKey = "user_id", rightKey = "dim_user",
          leftTime = "ts", rightTime = "valid_from",
          payloadCols = Seq("dim_type", "version"),
          rightTiebreak = "version")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), TsFmtSpark).as("ts"),
            col("dim_type"), col("version"))
      },
      Some(s"""WITH versions AS (
              |  ${graft.ingest.Upsert.scd2Sql("events", Seq("user_id"), "ts",
                    "event_id", Seq("event_type"), pred = "user_id < 50")
                    .replace("\n", "\n  ")}),
              |purch AS (
              |  SELECT event_id, user_id, ts FROM events
              |  WHERE user_id < 50 AND event_type = 'purchase')
              |SELECT p.event_id, p.user_id, strftime(p.ts, '$TsFmtDuck') AS ts,
              |  v.event_type AS dim_type, v.version
              |FROM purch p JOIN versions v
              |  ON v.user_id = p.user_id AND v.valid_from <= p.ts
              |  AND (v.valid_to IS NULL OR p.ts < v.valid_to)""".stripMargin)),

    // Marketing-style attribution: for each purchase, the first and last
    // non-purchase touch within the trailing 7 days — ONE window with a
    // RANGE frame over epoch-micros does both (conditional min/max of a
    // zero-padded packed key), so the whole query is a single shuffle on
    // user_id; no self-join, no per-purchase subquery. The packed-string
    // min/max is an argmin that stays inside codegen'd window aggregation.
    Q("s20_touch_attribution",
      (s, dir) => {
        val t = Tables(s, dir)
        val weekUs = 7L * 86400L * 1000000L
        val ep = unix_micros(col("ts"))
        val touchKey = when(col("event_type") =!= "purchase",
          concat(lpad(ep.cast("string"), 20, "0"), lit("|"),
            lpad(col("event_id").cast("string"), 12, "0"), lit("|"),
            col("event_type")))
        val w = Window.partitionBy(col("user_id")).orderBy(ep)
          .rangeBetween(-weekUs, 0L)
        t.events.filter(col("user_id") < 40)
          // both touches in ONE select so they share a single Window
          // operator (separate withColumns would plan two sorts)
          .select(col("*"), min(touchKey).over(w).as("first_touch"),
            max(touchKey).over(w).as("last_touch"))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            date_format(col("ts"), TsFmtSpark).as("ts"),
            element_at(split(col("first_touch"), "\\|"), 3).as("first_touch_type"),
            element_at(split(col("first_touch"), "\\|"), 2).cast("long")
              .as("first_touch_event"),
            element_at(split(col("last_touch"), "\\|"), 3).as("last_touch_type"),
            element_at(split(col("last_touch"), "\\|"), 2).cast("long")
              .as("last_touch_event"))
      },
      Some(s"""WITH scoped AS (
              |  SELECT *, epoch_us(ts) AS ep,
              |    CASE WHEN event_type <> 'purchase' THEN
              |      lpad(CAST(epoch_us(ts) AS VARCHAR), 20, '0') || '|' ||
              |      lpad(CAST(event_id AS VARCHAR), 12, '0') || '|' || event_type
              |    END AS touch_key
              |  FROM events WHERE user_id < 40),
              |framed AS (
              |  SELECT *,
              |    MIN(touch_key) OVER (PARTITION BY user_id ORDER BY ep
              |      RANGE BETWEEN ${7L * 86400L * 1000000L} PRECEDING
              |      AND CURRENT ROW) AS first_touch,
              |    MAX(touch_key) OVER (PARTITION BY user_id ORDER BY ep
              |      RANGE BETWEEN ${7L * 86400L * 1000000L} PRECEDING
              |      AND CURRENT ROW) AS last_touch
              |  FROM scoped)
              |SELECT event_id, user_id, strftime(ts, '$TsFmtDuck') AS ts,
              |  str_split(first_touch, '|')[3] AS first_touch_type,
              |  CAST(str_split(first_touch, '|')[2] AS BIGINT) AS first_touch_event,
              |  str_split(last_touch, '|')[3] AS last_touch_type,
              |  CAST(str_split(last_touch, '|')[2] AS BIGINT) AS last_touch_event
              |FROM framed WHERE event_type = 'purchase'""".stripMargin)),

    // Ordered funnel conversion (view → click → purchase, strictly
    // increasing timestamps): step k's time is the user's earliest
    // qualifying event AFTER step k-1's time, so a later click can't count
    // toward an earlier view. ONE exchange on user_id feeds three stacked
    // UNBOUNDED windows (no orderBy → no sort, each a pure per-partition
    // aggregate; step k's predicate references step k-1's column), then a
    // per-user dedup and one global count — no self-joins, no
    // per-step event rescans. The oracle computes the same chain as
    // sequential min-after-join CTEs.
    Q("s21_funnel_steps",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("user_id"))
        val e = t.events.select(col("user_id"), col("event_type"), col("ts"))
          .withColumn("t1",
            min(when(col("event_type") === "view", col("ts"))).over(w))
          .withColumn("t2",
            min(when(col("event_type") === "click" && col("ts") > col("t1"),
              col("ts"))).over(w))
          .withColumn("t3",
            min(when(col("event_type") === "purchase" && col("ts") > col("t2"),
              col("ts"))).over(w))
        val perUser = e.select(col("user_id"), col("t1"), col("t2"), col("t3"))
          .groupBy(col("user_id"))
          .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
            max(col("t3")).as("t3"))
        perUser.agg(
            count(col("t1")).as("n1"), count(col("t2")).as("n2"),
            count(col("t3")).as("n3"))
          .select(expr(
            "stack(3, '1_view', n1, '2_click', n2, '3_purchase', n3)")
            .as(Seq("stage", "n_users")))
      },
      Some("""WITH s1 AS (
             |  SELECT user_id, MIN(ts) AS t1 FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id
             |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
             |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM s1
             |UNION ALL SELECT '2_click', COUNT(*) FROM s2
             |UNION ALL SELECT '3_purchase', COUNT(*) FROM s3""".stripMargin)),

    // Trailing 7-day volatility of daily value per event type, from EXACT
    // integer second moments (BIGINT cents inside the frame — a double
    // stddev's accumulation order differs per engine and can't hash-match).
    // One exchange on the series key; only full windows are emitted.
    Q("s23_rolling_volatility",
      (s, dir) => {
        val t = Tables(s, dir)
        val daily = t.events
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg((sum(dec(col("value"))) * 100).cast("long").as("cents"))
        graft.operators.TimeSeries
          .rollingVol(daily, "event_type", "day", "cents", win = 7)
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("vol").as("vol_7d"))
      },
      Some(s"""WITH daily AS (
              |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
              |    CAST(SUM(${sqlDec("value")}) * 100 AS BIGINT) AS cents
              |  FROM events GROUP BY 1, 2),
              |${graft.operators.TimeSeries.rollingVolSql("daily", "event_type", "day", 7)}
              |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, vol AS vol_7d
              |FROM vol_out""".stripMargin),
    ),

    // EWMA smoothing (alpha = 0.25) of the same daily series: the
    // order-DEPENDENT recursion window functions can't express, computed
    // as a declarative sorted fold per key (collect_list → array_sort →
    // aggregate lambda). The oracle replays the identical IEEE op sequence
    // with a recursive CTE, so doubles hash-match bit-for-bit.
    Q("s24_ewma_smoothing",
      (s, dir) => {
        val t = Tables(s, dir)
        val daily = t.events
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(sumd(col("value")).as("x"))
        graft.operators.TimeSeries
          .ewma(daily, "event_type", "day", "x", alpha = 0.25)
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("x").as("sum_value"), col("ewma"))
      },
      Some(s"""WITH RECURSIVE daily AS (
              |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
              |    ${sqlSumd("value")} AS x
              |  FROM events GROUP BY 1, 2),
              |${graft.operators.TimeSeries.ewmaSql("daily", "event_type", "day", 0.25)}
              |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
              |  x AS sum_value, ewma FROM ew""".stripMargin),
    ),

    // UNKEYED time-proximity join: clicks within ±1 minute of each
    // purchase, ANY user — no equality predicate exists, so the naive plan
    // is a cartesian BNLJ. The operator turns it into an equi-join by
    // bucketing both sides on floor(epoch_us / tolerance) (right row: 1
    // bucket; left row: its 3 reachable buckets), carrying the true time
    // predicate as a post-filter — per-bucket cost tracks TRUE near pairs,
    // not n·m. The oracle runs the naive range join.
    Q("s25_binned_time_join",
      (s, dir) => {
        val t = Tables(s, dir)
        val purchases = t.events.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pid"), col("ts").as("pts"))
        val clicks = t.events.filter(col("event_type") === "click")
          .select(col("ts").as("cts"), col("value"))
        graft.operators.IntervalJoin
          .binnedTimePairs(purchases, "pts", clicks, "cts", 60000000L)
          .groupBy(col("pid"))
          .agg(count(lit(1)).as("n_nearby"), sumd(col("value")).as("click_value"))
          .select(col("pid").as("event_id"), col("n_nearby"), col("click_value"))
      },
      Some(s"""SELECT p.event_id, COUNT(*) AS n_nearby,
              |  ${sqlSumd("c.value")} AS click_value
              |FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
              |JOIN (SELECT ts, value FROM events WHERE event_type = 'click') c
              |  ON abs(epoch_us(c.ts) - epoch_us(p.ts)) <= 60000000
              |GROUP BY 1""".stripMargin)),
  )
}
