package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Merge/upsert for the normalized layer without a table format: latest-wins
  * by key over a union (the MERGE INTO analog when the sink is plain
  * parquet; pairs with dynamic partition overwrite for the write-back).
  *
  * Scale notes: one shuffle on the merge keys (the window), no join — at
  * 100 TB this is the same exchange a MERGE shuffle would pay; restrict
  * `base` to the partitions the updates touch (partition pruning) before
  * calling to avoid rewriting cold data.
  */
object Upsert {

  /** Keep one row per key: highest `versionCol` wins; at equal version the
    * update side beats base (deterministic).
    */
  def latestWins(base: DataFrame, updates: DataFrame,
      keys: Seq[String], versionCol: String): DataFrame = {
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(updates.withColumn("_src", lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col("_src").desc)
    tagged
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_src", "_rn")
  }

  /** Slowly-changing-dimension Type 2 history: collapse consecutive runs of
    * identical `attrs` values per key into validity intervals.
    *
    * A new version starts whenever any tracked attribute differs from the
    * previous observation of the same key (ordered by `tsCol`, tie-broken
    * by `tieCol` so the sequence is total in both engines). Output: keys ++
    * attrs ++ (valid_from, valid_to, version, is_current); `valid_to` is
    * the next version's start, null while current.
    *
    * Scale: two windows over the SAME (keys) partitioning — the second
    * reuses the first's exchange, so the whole op is one shuffle of the
    * observation stream. No joins.
    */
  def scd2(df: DataFrame, keys: Seq[String], tsCol: String, tieCol: String,
      attrs: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    // null-safe change detection: `<=>` treats NULL==NULL as equal, so
    // NULL→NULL is not a version and X→NULL is; the explicit first-row flag
    // is needed because lag-IS-NULL cannot distinguish "no previous row"
    // from "previous value was NULL"
    val changed = (row_number().over(w) === 1) ||
      attrs.map(a => !(lag(col(a), 1).over(w) <=> col(a))).reduce(_ || _)
    val versions = df
      .withColumn("_new_version", changed)
      .filter(col("_new_version"))
    val wv = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    versions
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wv))
      .withColumn("version", row_number().over(wv).cast("long"))
      .withColumn("is_current", col("valid_to").isNull.cast("long"))
      .select((keys ++ attrs).map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version"), col("is_current")): _*)
  }

  /** Incremental SCD2 maintenance: fold a batch of NEW observations into a
    * standing version table without rescanning closed history — the
    * foreachBatch companion of [[scd2]] (which rebuilds from all raw
    * events). Contract: batches are append-only in event time per key
    * (every batch ts >= the key's current valid_from), the Structured
    * Streaming shape.
    *
    * Mechanism: only the batch's keys are touched. Each affected key's
    * OPEN version is re-expressed as a pseudo-observation at its own
    * valid_from (null tie, so it sorts before any real event at the same
    * ts), the batch rows are appended, and [[scd2]] reruns on that small
    * relation; version numbers continue from the key's closed-history
    * count. Closed versions and unaffected keys pass through untouched.
    *
    * Scale: per-batch cost is |affected keys' open versions| + |batch| —
    * independent of history length; the only joins are a semi/anti pair
    * on the batch's key set (broadcastable) and the rebuilt relation is
    * batch-sized. `scd2Merge(scd2Merge(scd2(b1)), b2) == scd2(b1 ∪ b2)`
    * exactly (spec-proven), so checkpointed streaming maintenance is
    * trustworthy without periodic rebuilds.
    */
  def scd2Merge(standing: DataFrame, batch: DataFrame, keys: Seq[String],
      tsCol: String, tieCol: String, attrs: Seq[String]): DataFrame = {
    val affected = batch.select(keys.map(col): _*).distinct()
    val closed = standing.filter(col("is_current") === 0)
    val cur = standing.filter(col("is_current") === 1)
    val curAff = cur.join(affected, keys, "left_semi")
    val curUntouched = cur.join(affected, keys, "left_anti")
    val tieType = batch.schema(tieCol).dataType
    val pseudo = curAff.select(
      (keys ++ attrs).map(col) :+
        col("valid_from").as(tsCol) :+
        lit(null).cast(tieType).as(tieCol): _*)
    val base = curAff.select(
      keys.map(col) :+ (col("version") - 1).as("_base"): _*)
    val rebuilt = scd2(
      pseudo.unionByName(
        batch.select((keys ++ attrs).map(col) :+ col(tsCol) :+ col(tieCol): _*)),
      keys, tsCol, tieCol, attrs)
      .join(base, keys, "left")
      .withColumn("version", col("version") + coalesce(col("_base"), lit(0L)))
      .drop("_base")
    closed.unionByName(curUntouched).unionByName(rebuilt)
  }

  /** Incremental aggregate maintenance: fold a delta batch's partial rollup
    * into the standing rollup without touching raw history. Counts and
    * (decimal) sums are reassociable partials, so
    * `mergeRollup(rollup(base), rollup(delta)) == rollup(base ∪ delta)`
    * EXACTLY — the correctness contract that makes foreachBatch-maintained
    * daily aggregates (reference README.md:4 "cumulative monthly volumes")
    * trustworthy without periodic full recomputes.
    *
    * Scale notes: the union is |keys_current| + |keys_delta| rows — two
    * already-reduced relations, never raw data; one hash aggregation on the
    * rollup keys merges them. Keep sums in DecimalType until presentation so
    * the merge is order-independent.
    */
  def mergeRollup(current: DataFrame, delta: DataFrame, keys: Seq[String],
      sumCols: Seq[String], countCols: Seq[String]): DataFrame = {
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      countCols.map(c => sum(col(c)).cast("long").as(c))
    current.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Snapshot diff: compare two versions of a keyed table and emit one row
    * per key whose state changed — `change` ∈ added | removed | changed,
    * plus a comma-joined `changed_cols` naming which tracked columns
    * differ (null-safe compare, empty for added/removed). Unchanged keys
    * are dropped, so the output is the delta an incremental consumer
    * (CDC replay, cache invalidation, reconciliation report) applies.
    *
    * Scale notes: one full outer join on the key — the minimal shuffle any
    * snapshot compare pays; with both snapshots bucketed on the key
    * (util.Layout) the exchange disappears entirely. Column compares are
    * narrow null-safe predicates, no per-row UDF.
    */
  def snapshotDiff(old: DataFrame, newer: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = old.select((keys ++ compareCols).map(c => col(c).as("_o_" + c)): _*)
    val n = newer.select((keys ++ compareCols).map(c => col(c).as("_n_" + c)): _*)
    val joinCond = keys.map(k => col("_o_" + k) <=> col("_n_" + k)).reduce(_ && _)
    val joined = o.join(n, joinCond, "full_outer")
    val inOld = keys.map(k => col("_o_" + k).isNotNull).reduce(_ || _)
    val inNew = keys.map(k => col("_n_" + k).isNotNull).reduce(_ || _)
    val anyDiff = compareCols
      .map(c => !(col("_o_" + c) <=> col("_n_" + c))).reduce(_ || _)
    val change = when(!inOld, lit("added"))
      .when(!inNew, lit("removed"))
      .when(anyDiff, lit("changed"))
    val changedCols = concat_ws(",", compareCols.map(c =>
      when(inOld && inNew && !(col("_o_" + c) <=> col("_n_" + c)), lit(c))): _*)
    joined
      .withColumn("change", change)
      .filter(col("change").isNotNull)
      .withColumn("changed_cols", when(col("change") === "changed", changedCols)
        .otherwise(lit("")))
      .select(keys.map(k => coalesce(col("_o_" + k), col("_n_" + k)).as(k)) ++
        Seq(col("change"), col("changed_cols")): _*)
  }

  /** DuckDB twin of `snapshotDiff`: `old`/`newer` are full SELECT
    * statements over the same tables the Spark side read.
    */
  def snapshotDiffSql(old: String, newer: String, keys: Seq[String],
      compareCols: Seq[String]): String = {
    val joinCond = keys.map(k => s"o.$k IS NOT DISTINCT FROM n.$k").mkString(" AND ")
    val inOld = keys.map(k => s"o.$k IS NOT NULL").mkString(" OR ")
    val inNew = keys.map(k => s"n.$k IS NOT NULL").mkString(" OR ")
    val anyDiff = compareCols
      .map(c => s"(o.$c IS DISTINCT FROM n.$c)").mkString(" OR ")
    val changedCols = compareCols.map(c =>
      s"CASE WHEN ($inOld) AND ($inNew) AND o.$c IS DISTINCT FROM n.$c THEN '$c' END")
      .mkString("concat_ws(',', ", ", ", ")")
    val keyOut = keys.map(k => s"COALESCE(o.$k, n.$k) AS $k").mkString(", ")
    s"""WITH o AS ($old), n AS ($newer),
       |j AS (
       |  SELECT $keyOut,
       |    CASE WHEN NOT ($inOld) THEN 'added'
       |         WHEN NOT ($inNew) THEN 'removed'
       |         WHEN $anyDiff THEN 'changed' END AS change,
       |    CASE WHEN ($inOld) AND ($inNew) AND ($anyDiff)
       |         THEN $changedCols ELSE '' END AS changed_cols
       |  FROM o FULL OUTER JOIN n ON $joinCond)
       |SELECT * FROM j WHERE change IS NOT NULL""".stripMargin
  }

  /** DuckDB twin of `scd2` over `table` (same window semantics). */
  def scd2Sql(table: String, keys: Seq[String], tsCol: String, tieCol: String,
      attrs: Seq[String], pred: String = "TRUE"): String = {
    val k = keys.mkString(", ")
    val order = s"$tsCol ASC, $tieCol ASC"
    val changed = s"ROW_NUMBER() OVER (PARTITION BY $k ORDER BY $order) = 1 OR " +
      attrs
        .map(a => s"(LAG($a) OVER (PARTITION BY $k ORDER BY $order) " +
          s"IS DISTINCT FROM $a)")
        .mkString(" OR ")
    val cols = (keys ++ attrs).mkString(", ")
    s"""WITH flagged AS (
       |  SELECT *, ($changed) AS new_version
       |  FROM $table WHERE $pred),
       |versions AS (SELECT * FROM flagged WHERE new_version)
       |SELECT $cols,
       |  $tsCol AS valid_from,
       |  LEAD($tsCol) OVER (PARTITION BY $k ORDER BY $order) AS valid_to,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY $k ORDER BY $order) AS BIGINT) AS version,
       |  CAST(LEAD($tsCol) OVER (PARTITION BY $k ORDER BY $order) IS NULL AS BIGINT) AS is_current
       |FROM versions""".stripMargin
  }
}
