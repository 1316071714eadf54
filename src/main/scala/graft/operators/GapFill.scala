package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar densification + last-observation-carried-forward.
  *
  * The reference ingests ONE snapshot per day (`div_link_handler.py:35`:
  * `INGESTION_RUN_ID = date.today().isoformat()`), so its downstream daily
  * series has holes wherever a scrape failed or a commodity simply didn't
  * trade — and every "cumulative monthly volume" / time-series consumer
  * (reference README.md:4) needs an explicit dense calendar with the gaps
  * either zero-filled (flows: counts, volumes) or carried forward (levels:
  * last known price). This operator makes both shapes first-class.
  *
  * Scale notes (100 TB): the dense calendar is |keys| x |days| rows built by
  * a narrow `sequence`+`explode` from a 1-row broadcast span — no shuffle to
  * create it. The left join back to the observed dailies shuffles both sides
  * once on (key, day); the LOCF window re-shuffles on key alone. Days per key
  * is bounded (365/yr), so window partitions stay small no matter how many
  * keys there are — the operator scales in |keys|, which is the partition
  * axis. Nothing is collected to the driver.
  */
object GapFill {

  /** The dense (key × calendar-day) frame both fill variants share: every
    * key crossed with every day of the GLOBAL [min, max] span — one place
    * so the densification semantics can't drift between LOCF and interp.
    */
  private def denseCalendar(daily: DataFrame, keyCol: String,
      dayCol: String): DataFrame = {
    val span = daily.agg(min(col(dayCol)).as("_dmin"), max(col(dayCol)).as("_dmax"))
    daily.select(col(keyCol)).distinct()
      .join(broadcast(span)) // 1-row span onto every key: broadcast, no shuffle
      .select(col(keyCol),
        explode(sequence(col("_dmin"), col("_dmax"), expr("INTERVAL 1 DAY")))
          .as(dayCol))
  }

  /** Densify `daily` — one row per (`keyCol`, `dayCol`) — to every calendar
    * day in the GLOBAL [min, max] span of `dayCol`, then:
    *   - `countCol` is 0 on introduced rows (a flow: nothing happened);
    *   - `valueCol` stays null on introduced rows, and `locf_<valueCol>`
    *     carries the last observed value forward per key (a level);
    *   - `is_gap` marks introduced rows.
    *
    * `dayCol` must be a DateType column.
    */
  def denseLocf(daily: DataFrame, keyCol: String, dayCol: String,
      countCol: String, valueCol: String): DataFrame = {
    val cal = denseCalendar(daily, keyCol, dayCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq(keyCol, dayCol), "left")
      .select(
        col(keyCol), col(dayCol),
        coalesce(col(countCol), lit(0L)).as(countCol),
        col(valueCol),
        last(col(valueCol), ignoreNulls = true).over(w).as(s"locf_$valueCol"),
        col(countCol).isNull.as("is_gap"))
  }

  /** Densify like `denseLocf`, but fill level gaps by LINEAR INTERPOLATION
    * between the surrounding observations instead of carrying the last one
    * forward: on a gap day d between observations (d₀,v₀) and (d₁,v₁),
    *   interp = v₀ + (v₁-v₀)·(d-d₀)/(d₁-d₀)
    * — exact day arithmetic, one IEEE expression shape in both engines.
    * Leading/trailing gaps (no observation on one side) stay null — the
    * honest choice; compose with LOCF if edges must be filled.
    *
    * Scale notes: two windows (backward carry, forward carry) over the SAME
    * key partitioning — the second reuses the first's exchange; otherwise
    * identical shape to `denseLocf`.
    */
  def denseInterp(daily: DataFrame, keyCol: String, dayCol: String,
      countCol: String, valueCol: String): DataFrame = {
    val cal = denseCalendar(daily, keyCol, dayCol)
    val back = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col(valueCol).isNotNull, col(dayCol))
    val joined = cal.join(daily, Seq(keyCol, dayCol), "left")
      .withColumn("_pv", last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn("_pd", last(obsDay, ignoreNulls = true).over(back))
      .withColumn("_nv", first(col(valueCol), ignoreNulls = true).over(fwd))
      .withColumn("_nd", first(obsDay, ignoreNulls = true).over(fwd))
    val frac = datediff(col(dayCol), col("_pd")).cast("double") /
      datediff(col("_nd"), col("_pd")).cast("double")
    joined
      .withColumn(s"interp_$valueCol",
        when(col(valueCol).isNotNull, col(valueCol))
          .when(col("_pv").isNotNull && col("_nv").isNotNull,
            col("_pv") + (col("_nv") - col("_pv")) * frac))
      .select(col(keyCol), col(dayCol),
        coalesce(col(countCol), lit(0L)).as(countCol),
        col(valueCol), col(s"interp_$valueCol"),
        col(countCol).isNull.as("is_gap"))
  }
}
