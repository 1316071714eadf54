package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed time-series smoothing/dispersion operators over a daily series,
  * built engine-exact like the rest of the engine (the DuckDB oracle
  * hash-matches bit-for-bit):
  *
  *  - [[rollingVol]]: trailing-window sample volatility from EXACT integer
  *    second moments — `n·Σx² − (Σx)²` accumulated in BIGINT cents inside
  *    the frame (order-independent, unlike a double `stddev` whose
  *    accumulation order differs per engine), with one final double
  *    division and sqrt (deterministic functions of exact values).
  *  - [[ewma]]: exponential smoothing `s_t = α·x_t + (1−α)·s_{t−1}` — the
  *    order-DEPENDENT recursion window functions can't express. Computed as
  *    a declarative sorted fold: `collect_list(struct(day, x))` per key,
  *    `array_sort`, then one `aggregate` lambda appending each smoothed
  *    value (the oracle replays the identical IEEE op sequence with a
  *    recursive CTE). Per-key series must fit in one aggregation buffer —
  *    true for daily market series (years ≈ thousands of elements); for
  *    unbounded per-key series the scale path is secondary-sort
  *    `mapPartitions` over `repartition(key).sortWithinPartitions(key,
  *    day)`, same fold, constant memory.
  *
  * Scale: both are one shuffle on the series key (the window/groupBy
  * exchange); nothing widens — rolling state is 3 longs per row, EWMA state
  * is the per-key series. The input is expected pre-aggregated to one row
  * per (key, day) — aggregate first, smooth after, so the shuffle carries
  * days, not raw events.
  */
object TimeSeries {

  /** Trailing `win`-row sample volatility per key over a daily series.
    *
    * `centsCol` must be an exact integer (cents) column — the caller owns
    * the decimal→cents conversion so the operator never touches a lossy
    * double. Emits only FULL windows (`n == win`): a shorter history has a
    * different estimator variance and would silently mix regimes.
    * Output: key, day, vol = sqrt((win·Σx² − (Σx)²) / (win·(win−1))) / 100
    * in dollars.
    */
  def rollingVol(daily: DataFrame, keyCol: String, dayCol: String,
      centsCol: String, win: Int): DataFrame = {
    require(win >= 2, s"win=$win must be >= 2 (sample variance divides by win-1)")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(-(win - 1), Window.currentRow)
    val x = col(centsCol)
    daily
      .withColumn("_sx", sum(x).over(w))
      .withColumn("_sxx", sum(x * x).over(w))
      .withColumn("_n", count(x).over(w))
      .filter(col("_n") === win)
      .select(col(keyCol), col(dayCol),
        (sqrt((lit(win.toLong) * col("_sxx") - col("_sx") * col("_sx"))
          .cast("double") / lit((win.toLong * (win - 1)).toDouble)) / 100.0)
          .as("vol"))
  }

  /** EWMA per key over a daily double series: s_1 = x_1,
    * s_t = α·x_t + (1−α)·s_{t−1}, evaluated as exactly
    * `(α·x) + ((1−α)·s)` so the oracle's recursive CTE reproduces every
    * IEEE intermediate. Output: key, day, x, ewma (one row per input row).
    */
  def ewma(daily: DataFrame, keyCol: String, dayCol: String,
      valCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha=$alpha must be in (0, 1]")
    val series = daily
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col(dayCol).as("day"),
        col(valCol).as("x")))).as("ser"))
    // fold the sorted series into a parallel array of smoothed values:
    // acc[i] = ewma of ser[1..i]; element_at(acc, size(acc)) is s_{t-1}
    // (guarded by the when so the empty-array branch never indexes)
    val folded = series.withColumn("ew",
      aggregate(col("ser"),
        expr("CAST(array() AS ARRAY<DOUBLE>)"),
        (acc, e) => array_append(acc,
          when(size(acc) === 0, e.getField("x"))
            .otherwise(lit(alpha) * e.getField("x") +
              lit(1.0 - alpha) * element_at(acc, size(acc))))))
    folded
      .select(col(keyCol), posexplode(col("ser")).as(Seq("i", "e")), col("ew"))
      .select(col(keyCol), col("e.day").as(dayCol), col("e.x").as(valCol),
        element_at(col("ew"), col("i") + 1).as("ewma"))
  }

  /** [[rollingVol]] oracle fragment: `daily` must expose (key, day, cents).
    * CTE chain ending in relation `vol_out` = (key, day, vol) — the caller
    * writes the final SELECT.
    */
  def rollingVolSql(daily: String, key: String, day: String, win: Int): String = {
    val denom = (win.toLong * (win - 1)).toDouble
    s"""roll AS (
       |  SELECT $key, $day,
       |    CAST(SUM(cents) OVER w AS BIGINT) AS sx,
       |    CAST(SUM(cents * cents) OVER w AS BIGINT) AS sxx,
       |    COUNT(*) OVER w AS n
       |  FROM $daily
       |  WINDOW w AS (PARTITION BY $key ORDER BY $day
       |    ROWS BETWEEN ${win - 1} PRECEDING AND CURRENT ROW)),
       |vol_out AS (
       |  SELECT $key, $day,
       |    sqrt(CAST($win * sxx - sx * sx AS DOUBLE) / $denom) / 100.0 AS vol
       |  FROM roll WHERE n = $win)""".stripMargin
  }

  /** [[ewma]] oracle fragment: `daily` must expose (key, day, x); the
    * recursive-CTE replay ending in relation `ew` = (key, day, x, rn, ewma).
    * Must be spliced into a `WITH RECURSIVE` chain; the caller writes the
    * final SELECT.
    */
  def ewmaSql(daily: String, key: String, day: String, alpha: Double): String =
    s"""rn AS (
       |  SELECT $key, $day, x,
       |    ROW_NUMBER() OVER (PARTITION BY $key ORDER BY $day) AS rn
       |  FROM $daily),
       |ew AS (
       |  SELECT $key, $day, x, rn, x AS ewma FROM rn WHERE rn = 1
       |  UNION ALL
       |  SELECT r.$key, r.$day, r.x, r.rn,
       |    ($alpha * r.x) + (${1.0 - alpha} * e.ewma) AS ewma
       |  FROM rn r JOIN ew e ON r.$key = e.$key AND r.rn = e.rn + 1)""".stripMargin
}
