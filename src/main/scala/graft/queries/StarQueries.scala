package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.NameFns
import graft.util.Tables

/** Core analytics over the star schema (SURVEY.md §2.3–§2.8).
  *
  * These re-express the reference's implied analytics (daily volumes,
  * cumulative monthly volumes, revenue, top-5; reference README.md:4,
  * scraper/form_handler.py:8-10) on the driver's TPC-H-ish tables, plus the
  * join/set/window surface the reference lacks but the engine must provide.
  *
  * Scale notes (100 TB): every aggregation here is a partial+final hash
  * aggregate (map-side combine) on Spark's side; joins against the small
  * dimension tables (part, customer, supplier, nation, region) are explicitly
  * broadcast so only the fact table streams; filters/projections sit directly
  * on the parquet scan so pushdown + column pruning apply.
  */
object StarQueries {
  import Num._

  val all: Seq[Q] = Seq(
    // A1/A5-analog pricing summary (partial+final agg; single shuffle on two
    // low-cardinality keys — at 100 TB the map-side combine reduces each
    // partition to ~6 rows before the exchange).
    Q("q01_pricing_summary",
      (s, dir) => {
        val t = Tables(s, dir)
        val one = lit(1).cast(DecimalType(18, 2))
        t.lineitem
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sumd(col("l_quantity")).as("sum_qty"),
            sumd(col("l_extendedprice")).as("sum_base_price"),
            sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
              .cast("double").as("sum_disc_price"),
            avgd(col("l_quantity")).as("avg_qty"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${sqlSumd("l_quantity")} AS sum_qty,
              |  ${sqlSumd("l_extendedprice")} AS sum_base_price,
              |  CAST(SUM(${sqlDec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,2)) - ${sqlDec("l_discount")})) AS DOUBLE) AS sum_disc_price,
              |  ${sqlAvgd("l_quantity")} AS avg_qty,
              |  COUNT(*) AS count_order
              |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // A7+A8: the reference's flagship implied analytic — top-5 by revenue
    // (README.md:4 "revenue figures"; form_handler.py:8-10 top-five stub).
    // part is a dimension → broadcast join; ties broken by p_brand for
    // deterministic top-k.
    Q("q02_top5_brand_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        val one = lit(1).cast(DecimalType(18, 2))
        t.lineitem
          .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(sum(dec(col("l_extendedprice")) * (one - dec(col("l_discount"))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("p_brand").asc)
          .limit(5)
      },
      Some(s"""SELECT p_brand,
              |  CAST(SUM(${sqlDec("l_extendedprice")} * (CAST(1 AS DECIMAL(18,2)) - ${sqlDec("l_discount")})) AS DOUBLE) AS revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |GROUP BY p_brand ORDER BY revenue DESC, p_brand ASC LIMIT 5""".stripMargin)),

    // 3-way join: fact ⋈ orders ⋈ customer, revenue by market segment.
    // customer/orders side is pre-aggregated? No — orders is mid-size: join
    // fact→orders on orderkey (shuffle), then broadcast customer.
    Q("q03_segment_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(
            sumd(col("l_extendedprice")).as("sum_price"),
            countDistinct(col("o_orderkey")).as("n_orders"))
      },
      Some(s"""SELECT c_mktsegment,
              |  ${sqlSumd("l_extendedprice")} AS sum_price,
              |  COUNT(DISTINCT o_orderkey) AS n_orders
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |GROUP BY c_mktsegment""".stripMargin)),

    // A5: daily volume sums ("daily volumes sold", reference README.md:4).
    Q("q04_daily_volume",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
          .agg(
            sumd(col("l_quantity")).as("sum_qty"),
            count(lit(1)).as("n_lines"))
      },
      Some(s"""SELECT strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
              |  ${sqlSumd("l_quantity")} AS sum_qty, COUNT(*) AS n_lines
              |FROM lineitem GROUP BY 1""".stripMargin)),

    // A6: cumulative monthly volumes ("cumulative monthly volumes",
    // reference README.md:4) — running sum over an ordered window per group.
    // Monthly pre-aggregation happens BEFORE the window, so the window input
    // is tiny (groups × months) regardless of fact size.
    Q("q05_cumulative_monthly_volume",
      (s, dir) => {
        val t = Tables(s, dir)
        val monthly = t.lineitem
          .groupBy(
            col("l_returnflag").as("flag"),
            date_trunc("month", col("l_shipdate")).as("month"))
          .agg(sum(dec(col("l_quantity"))).as("qty"))
        val w = Window.partitionBy(col("flag")).orderBy(col("month"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        monthly
          .withColumn("cum_qty", sum(col("qty")).over(w).cast("double"))
          .select(col("flag"), date_format(col("month"), "yyyy-MM").as("month"),
            col("qty").cast("double").as("qty"), col("cum_qty"))
      },
      Some(s"""WITH monthly AS (
              |  SELECT l_returnflag AS flag, date_trunc('month', l_shipdate) AS month,
              |         SUM(${sqlDec("l_quantity")}) AS qty
              |  FROM lineitem GROUP BY 1, 2)
              |SELECT flag, strftime(month, '%Y-%m') AS month, CAST(qty AS DOUBLE) AS qty,
              |  CAST(SUM(qty) OVER (PARTITION BY flag ORDER BY month
              |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_qty
              |FROM monthly""".stripMargin)),

    // TPC-H Q6-shaped selective scan: predicate + column pruning must reach
    // the parquet reader (PushedFilters in .explain).
    Q("q06_forecast_revenue",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
            col("l_discount").between(0.04, 0.07) &&
            col("l_quantity") < 24)
          .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
            .cast("double").as("revenue"),
            count(lit(1)).as("n"))
      },
      Some(s"""SELECT
              |  CAST(SUM(${sqlDec("l_extendedprice")} * ${sqlDec("l_discount")}) AS DOUBLE) AS revenue,
              |  COUNT(*) AS n
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
              |  AND l_discount BETWEEN 0.04 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // F4-analog: anti join (reference skip-completed semantics,
    // div_link_handler.py:501-503, as a relational op). Broadcast the
    // build side at scale when it is the small ledger.
    Q("q07_customers_without_recent_orders",
      (s, dir) => {
        val t = Tables(s, dir)
        val recent = t.orders
          .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        t.customer
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |  WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2001-01-01')""".stripMargin)),

    // Semi join: orders having at least one heavy line.
    Q("q08_priority_heavy_orders",
      (s, dir) => {
        val t = Tables(s, dir)
        val heavy = t.lineitem.filter(col("l_quantity") > 45)
        t.orders
          .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
             |GROUP BY o_orderpriority""".stripMargin)),

    // §2.7 set ops + schema drift: unionByName with missing columns — the
    // engine analog of the reference's header-drift union (SURVEY.md §7
    // "dynamic schemas"). supplier lacks c_mktsegment → null-filled.
    Q("q09_union_schema_drift",
      (s, dir) => {
        val t = Tables(s, dir)
        val cust = t.customer.select(
          col("c_name").as("name"), col("c_acctbal").as("acctbal"),
          col("c_mktsegment").as("segment"), lit("customer").as("side"))
        val supp = t.supplier.select(
          col("s_name").as("name"), col("s_acctbal").as("acctbal"),
          lit("supplier").as("side"))
        cust.unionByName(supp, allowMissingColumns = true)
          .groupBy(col("side"))
          .agg(
            count(lit(1)).as("n"),
            sumd(col("acctbal")).as("sum_acctbal"),
            count(when(col("segment").isNull, lit(1))).as("n_null_segment"))
      },
      Some(s"""WITH u AS (
              |  SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment, 'customer' AS side FROM customer
              |  UNION ALL
              |  SELECT s_name, s_acctbal, NULL, 'supplier' FROM supplier)
              |SELECT side, COUNT(*) AS n, ${sqlSumd("acctbal")} AS sum_acctbal,
              |  COUNT(CASE WHEN segment IS NULL THEN 1 END) AS n_null_segment
              |FROM u GROUP BY side""".stripMargin)),

    // S1: the reference's name sanitizer applied as a relational function
    // (scraper/div_link_handler.py:116-123).
    Q("q10_sanitize_part_names",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part
          .groupBy(NameFns.sanitizeName(col("p_name")).as("sanitized"))
          .agg(count(lit(1)).as("n"), min(col("p_partkey")).as("min_key"))
      },
      Some(s"""SELECT ${NameFns.sanitizeNameSql("p_name")} AS sanitized,
              |  COUNT(*) AS n, MIN(p_partkey) AS min_key
              |FROM part GROUP BY 1""".stripMargin)),

    // §2.5: ranking window — top-3 parts per brand by retail price.
    Q("q11_top3_per_brand",
      (s, dir) => {
        val t = Tables(s, dir)
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
        t.part
          .withColumn("rn", row_number().over(w).cast("long"))
          .filter(col("rn") <= 3)
          .select(col("p_brand"), col("p_partkey"),
            col("p_retailprice"), col("rn"))
      },
      Some("""SELECT p_brand, p_partkey, p_retailprice, CAST(rn AS BIGINT) AS rn FROM (
             |  SELECT p_brand, p_partkey, p_retailprice,
             |    ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
             |  FROM part) WHERE rn <= 3""".stripMargin)),

    // Grouping sets surface: rollup over (returnflag, linestatus).
    Q("q12_rollup_volumes",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(sumd(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      },
      Some(s"""SELECT l_returnflag, l_linestatus,
              |  ${sqlSumd("l_quantity")} AS sum_qty, COUNT(*) AS n
              |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // Distinct aggregation per group.
    Q("q13_distinct_customers",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders
          .groupBy(col("o_orderstatus"))
          .agg(
            countDistinct(col("o_custkey")).as("n_custs"),
            count(lit(1)).as("n_orders"))
      },
      Some("""SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs,
             |  COUNT(*) AS n_orders FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // Multi-hop dimension chain: nation→region broadcast joins, supplier
    // account balances by region.
    Q("q14_region_supplier_balance",
      (s, dir) => {
        val t = Tables(s, dir)
        t.supplier
          .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(sumd(col("s_acctbal")).as("sum_bal"), count(lit(1)).as("n_supp"))
      },
      Some(s"""SELECT r_name, ${sqlSumd("s_acctbal")} AS sum_bal, COUNT(*) AS n_supp
              |FROM supplier JOIN nation ON s_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY r_name""".stripMargin)),
  )
}
