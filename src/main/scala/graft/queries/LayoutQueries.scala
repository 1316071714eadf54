package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.util.{Layout, Tables}

/** Physical-layout queries (SURVEY.md §4): the bucketed fact⋈fact join.
  *
  * b01 lays both fact tables out bucketed by the join key
  * (`Layout.writeBucketed`, 16 buckets, one file per bucket via an aligned
  * repartition) and joins them: Spark plans a SortMergeJoin with NO
  * Exchange on either side — the bucketing metadata proves co-partitioning,
  * which is exactly what a pipeline repeating this join at 100 TB banks on
  * (pay the shuffle once at write time, never again per query). The only
  * exchange left in the plan is the final tiny aggregation
  * (plan-asserted in PlanShapeSpec). The layout write is idempotent per
  * (session, sf dir) — re-invocations reuse the existing tables.
  */
object LayoutQueries {
  import Num._

  /** Derived layouts already (re)written by THIS JVM, keyed by root/table.
    * `computeIfAbsent` makes the write-then-read safe under concurrency: a
    * second caller for the same key BLOCKS until the first finishes the
    * write, instead of racing ahead and reading a half-written layout.
    */
  private val written =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()

  private def oncePerKey(key: String)(work: => Unit): Unit =
    written.computeIfAbsent(key, _ => { work; java.lang.Boolean.TRUE })

  private[queries] def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  /** Create the bucketed table once per (catalog, name). A fresh session's
    * in-memory catalog may not know a table whose warehouse directory
    * survives from an earlier JVM — CTAS refuses such a location, so drop
    * the orphaned directory first.
    */
  private[queries] def ensureTable(s: org.apache.spark.sql.SparkSession, table: String)
      (write: => Unit): Unit = oncePerKey(table) {
    if (!s.catalog.tableExists(table)) {
      val wh = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), table)
      val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) fs.delete(wh, true)
      write
    }
  }

  val all: Seq[Q] = Seq(
    Q("b01_bucketed_order_join",
      (s, dir) => {
        val t = Tables(s, dir)
        val oTab = s"g_orders_bkt_${tag(dir)}"
        val lTab = s"g_lineitem_bkt_${tag(dir)}"
        ensureTable(s, oTab)(Layout.writeBucketed(
          t.orders.select(col("o_orderkey"), col("o_orderpriority"))
            .repartition(16, col("o_orderkey")),
          oTab, "o_orderkey", 16, Some("o_orderkey")))
        ensureTable(s, lTab)(Layout.writeBucketed(
          t.lineitem.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
            .repartition(16, col("l_orderkey")),
          lTab, "l_orderkey", 16, Some("l_orderkey")))
        val one = lit(1).cast(DecimalType(18, 2))
        s.table(oTab)
          .join(s.table(lTab), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            count(lit(1)).as("n_lines"),
            sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
              .cast("double").as("revenue"))
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
              |  CAST(SUM(${sqlDec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,2)) - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |GROUP BY o_orderpriority""".stripMargin)),

    // Partition pruning: events laid out hive-partitioned by ingest_date
    // (the daily-sink layout every incremental pipeline lands on); a
    // single-day query must touch ONE partition directory — the scan's
    // PartitionFilters prune the other ~29 days at planning time, the
    // file-listing analog of reading 1/30th of 100 TB (plan-asserted in
    // PlanShapeSpec).
    Q("b02_partition_pruned_day",
      (s, dir) => {
        val t = Tables(s, dir)
        val root = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), s"g_events_bydate_${tag(dir)}").toString
        // rewrite once per JVM, not per on-disk _SUCCESS: a marker surviving
        // from an earlier run would silently serve STALE data after the
        // source dataset is regenerated (b01's ensureTable has the same
        // per-session freshness semantics via the in-memory catalog)
        oncePerKey(root) {
          t.events.withColumn("ingest_date", to_date(col("ts")))
            .write.mode("overwrite").partitionBy("ingest_date").parquet(root)
        }
        s.read.parquet(root)
          .filter(col("ingest_date") === lit("2024-01-15").cast("date"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sumd(col("value")).as("sum_value"))
      },
      Some(s"""SELECT event_type, COUNT(*) AS n, ${sqlSumd("value")} AS sum_value
              |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-15'
              |GROUP BY event_type""".stripMargin)),

    // Sort-on-write clustering (zone-map layout): lineitem rewritten
    // range-partitioned + sorted by l_shipdate, so every parquet file/row
    // group covers a narrow disjoint date band and a date-range query
    // skips the rest on footer min/max alone — the unpartitioned-column
    // analog of b02's directory pruning (at 100 TB: sort/Z-order on the
    // hot filter column ⇒ scan cost tracks the DATE RANGE, not the table).
    // The range boundaries Spark samples are nondeterministic, but the
    // ANSWER never depends on them — only file placement does (the
    // disjoint-band property is asserted per file in PlanShapeSpec, not
    // here).
    Q("b03_sorted_layout_skip",
      (s, dir) => {
        val t = Tables(s, dir)
        val root = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), s"g_lineitem_bydate_${tag(dir)}").toString
        oncePerKey(root) {
          t.lineitem.select(col("l_shipdate"), col("l_quantity"), col("l_extendedprice"))
            .repartitionByRange(8, col("l_shipdate"))
            .sortWithinPartitions(col("l_shipdate"))
            .write.mode("overwrite").parquet(root)
        }
        s.read.parquet(root)
          .filter(col("l_shipdate") >= lit("1995-06-01").cast("timestamp") &&
            col("l_shipdate") < lit("1995-07-01").cast("timestamp"))
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
          .agg(count(lit(1)).as("n_lines"), sumd(col("l_quantity")).as("sum_qty"))
      },
      Some(s"""SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
              |  COUNT(*) AS n_lines, ${sqlSumd("l_quantity")} AS sum_qty
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_shipdate < TIMESTAMP '1995-07-01'
              |GROUP BY 1""".stripMargin)),

    // Runtime bloom-filter join pruning: the selective dim-side filter
    // (urgent orders) is turned into a bloom filter EVALUATED INSIDE THE
    // FACT SCAN, so non-matching lineitem rows die before the join
    // shuffle — semi-join pushdown, the row-level analog of partition
    // pruning. At 100 TB this is the difference between shuffling the
    // whole fact table and shuffling the ~20% that can possibly join.
    // The injection thresholds are sized for clusters (10 GB application
    // side), so they are lowered for the demo INSIDE a save/restore conf
    // window, with the join materialized eagerly (localCheckpoint) while
    // the window is open — optimization happens at execution, not
    // DataFrame construction. Broadcast is disabled in the window because
    // Spark (rightly) skips bloom injection when the dim broadcasts; at
    // this sf the dim fits, at scale it would not. Plan asserted in
    // PlanShapeSpec (BloomFilterMightContain on the fact scan).
    // Z-order clustering: lineitem rewritten sorted by the Morton
    // interleave of (l_partkey, l_suppkey), so each file covers a
    // RECTANGLE in that plane and a two-column box predicate skips files
    // on footer min/max of BOTH columns — where b03's single-column sort
    // clusters only its sort column and leaves every file spanning the
    // full range of the other. The rectangle property is asserted on the
    // written files in PlanShapeSpec; the answer itself is
    // layout-independent (plain filtered aggregate, trivially oracled).
    Q("b05_zorder_layout",
      (s, dir) => {
        val t = Tables(s, dir)
        val root = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir"), s"g_lineitem_zorder_${tag(dir)}").toString
        oncePerKey(root) {
          val sel = t.lineitem.select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
          // one-row stats pass: min-max scaling bounds for the interleave
          // (layout placement only — never part of any query answer)
          val mx = sel.agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
          sel
            .withColumn("_z", Layout.zorder2(col("l_partkey"), col("l_suppkey"),
              mx.getLong(0), mx.getLong(1), 16))
            .repartitionByRange(8, col("_z"))
            .sortWithinPartitions(col("_z"))
            .drop("_z")
            .write.mode("overwrite").parquet(root)
        }
        s.read.parquet(root)
          .filter(col("l_partkey") >= 800 && col("l_partkey") < 1000 &&
            col("l_suppkey") >= 20 && col("l_suppkey") < 40)
          .agg(count(lit(1)).as("n_lines"), sumd(col("l_quantity")).as("sum_qty"))
      },
      Some(s"""SELECT COUNT(*) AS n_lines, ${sqlSumd("l_quantity")} AS sum_qty
              |FROM lineitem
              |WHERE l_partkey >= 800 AND l_partkey < 1000
              |  AND l_suppkey >= 20 AND l_suppkey < 40""".stripMargin)),

    // Raw parquet reads, NOT Tables(...): the local-scan spread wraps the
    // relation in a Repartition, and InjectRuntimeFilter's creation-side
    // walk (extractSelectiveFilterOverScan) only traverses Project/Filter/
    // Join nodes — a Repartition anywhere under the filter silently vetoes
    // injection. At cluster scale the spread is a no-op (scans arrive
    // multi-split), so the raw read IS the scale-faithful shape here.
    Q("b04_runtime_bloom_join",
      (s, dir) => {
        withConfs(s,
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
          val one = lit(1).cast(DecimalType(18, 2))
          s.read.parquet(s"$dir/orders.parquet")
            .filter(col("o_orderpriority") === "1-URGENT")
            .join(s.read.parquet(s"$dir/lineitem.parquet"),
              col("o_orderkey") === col("l_orderkey"))
            .groupBy(col("o_orderpriority"))
            .agg(count(lit(1)).as("n_lines"),
              sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
                .cast("double").as("revenue"))
            .localCheckpoint(true)
        }
      },
      Some(s"""SELECT o_orderpriority, COUNT(*) AS n_lines,
              |  CAST(SUM(${sqlDec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,2)) - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              |WHERE o_orderpriority = '1-URGENT'
              |GROUP BY o_orderpriority""".stripMargin)),
  )

  /** Set confs, run `body`, restore the previous values — `body` must
    * EXECUTE (not just declare) any plan that depends on the confs, since
    * Catalyst optimizes at action time.
    */
  private def withConfs[A](s: org.apache.spark.sql.SparkSession,
      confs: (String, String)*)(body: => A): A = {
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
