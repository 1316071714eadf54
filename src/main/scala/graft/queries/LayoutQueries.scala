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

  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)

  /** Create the bucketed table once per (catalog, name). A fresh session's
    * in-memory catalog may not know a table whose warehouse directory
    * survives from an earlier JVM — CTAS refuses such a location, so drop
    * the orphaned directory first.
    */
  private def ensureTable(s: org.apache.spark.sql.SparkSession, table: String)
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
  )
}
