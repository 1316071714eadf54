package graft.queries

import org.apache.spark.sql.functions._

import graft.util.Tables

/** Second slice of relational surface: exact percentiles, pivot-style
  * conditional aggregation, array aggregation, full outer join, and the SQL
  * entry point itself (`spark.sql` over registered views with CTEs +
  * window functions) — §2.4–§2.8 completeness.
  */
object SqlQueries {
  import Num._

  val all: Seq[Q] = Seq(
    // Exact percentiles (continuous interpolation — same definition as
    // DuckDB's quantile_cont), via the distributed window-sort path: built-in
    // `percentile` buffers every group value in one aggregation buffer (OOM
    // on a hot group at scale); groupedQuantileCont sorts within the group
    // and interpolates the two bracketing ranks — identical result.
    Q("q15_price_percentiles",
      (s, dir) => {
        val t = Tables(s, dir)
        graft.operators.Quantiles
          .groupedQuantileCont(t.part, "p_brand", "p_retailprice",
            Seq("p50" -> 0.5, "p90" -> 0.9))
          .select(col("p_brand"), col("p50"), col("p90"), col("n"))
      },
      Some("""SELECT p_brand,
             |  quantile_cont(p_retailprice, 0.5) AS p50,
             |  quantile_cont(p_retailprice, 0.9) AS p90,
             |  COUNT(*) AS n
             |FROM part GROUP BY p_brand""".stripMargin)),

    // Pivot-style conditional aggregation: one column per return flag.
    Q("q16_pivot_returnflag",
      (s, dir) => {
        val t = Tables(s, dir)
        t.lineitem
          .groupBy(col("l_linestatus"))
          .agg(
            sum(when(col("l_returnflag") === "A", dec(col("l_quantity")))).cast("double").as("qty_a"),
            sum(when(col("l_returnflag") === "N", dec(col("l_quantity")))).cast("double").as("qty_n"),
            sum(when(col("l_returnflag") === "R", dec(col("l_quantity")))).cast("double").as("qty_r"))
      },
      Some(s"""SELECT l_linestatus,
              |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN ${sqlDec("l_quantity")} END) AS DOUBLE) AS qty_a,
              |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN ${sqlDec("l_quantity")} END) AS DOUBLE) AS qty_n,
              |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN ${sqlDec("l_quantity")} END) AS DOUBLE) AS qty_r
              |FROM lineitem GROUP BY l_linestatus""".stripMargin)),

    // AR1/A4-analog: set accumulation per key, canonically sorted. Emitted
    // as a joined scalar string (not array<string>: the driver's pandas
    // compare can't sort array columns) — the array form is spec-covered.
    Q("q17_nation_set_per_region",
      (s, dir) => {
        val t = Tables(s, dir)
        t.nation
          .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            array_join(sort_array(collect_set(col("n_name"))), ",").as("nations"),
            countDistinct(col("n_name")).as("n_nations"))
      },
      Some("""SELECT r_name,
             |  array_to_string(list_sort(list_distinct(array_agg(n_name))), ',') AS nations,
             |  COUNT(DISTINCT n_name) AS n_nations
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin)),

    // Full outer join of two aggregates (null-filled on both sides).
    Q("q18_cust_supp_by_nation",
      (s, dir) => {
        val t = Tables(s, dir)
        val c = t.customer.groupBy(col("c_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_cust"))
        val sup = t.supplier.groupBy(col("s_nationkey").as("nk"))
          .agg(count(lit(1)).as("n_supp"))
        c.withColumnRenamed("nk", "c_nk")
          .join(sup.withColumnRenamed("nk", "s_nk"),
            col("c_nk") === col("s_nk"), "full_outer")
          .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      },
      Some("""WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
             |s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
             |SELECT COALESCE(c.nk, s.nk) AS nationkey,
             |  COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
             |FROM c FULL OUTER JOIN s ON c.nk = s.nk""".stripMargin)),

    // The SQL entry point itself: spark.sql over registered views, CTE +
    // window + join — TPC-H Q3-shaped.
    //
    // The rank window's ORDER BY is a TOTAL order (o_orderkey is unique
    // per revenue row), so RANK() can never tie and `rnk <= 10` selects
    // exactly the first 10 rows of that order. The inner ORDER BY/LIMIT
    // prefix therefore yields IDENTICAL output while compiling to
    // TakeOrderedAndProject (per-partition top-k heaps) instead of an
    // unpartitioned RANK over EVERY per-order revenue row — the classic
    // single-partition window Spark itself warns about ("No Partition
    // Defined for Window"), which at fleet scale moves billions of
    // aggregated rows through one task. The window then ranks only the
    // 10 survivors. The ORACLE keeps the original global-window form —
    // the hash gate is what proves the rewrite equivalent.
    Q("q19_sql_api_topk_orders",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.createOrReplaceTempView("customer")
        t.orders.createOrReplaceTempView("orders")
        t.lineitem.createOrReplaceTempView("lineitem")
        s.sql(
          """WITH revenue AS (
            |  SELECT o_orderkey, c_mktsegment,
            |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
            |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
            |  FROM customer JOIN orders ON c_custkey = o_custkey
            |  JOIN lineitem ON l_orderkey = o_orderkey
            |  WHERE c_mktsegment = 'BUILDING'
            |  GROUP BY o_orderkey, c_mktsegment),
            |top10 AS (
            |  SELECT o_orderkey, rev FROM revenue
            |  ORDER BY rev DESC, o_orderkey ASC LIMIT 10)
            |SELECT o_orderkey, rev,
            |  CAST(RANK() OVER (ORDER BY rev DESC, o_orderkey ASC) AS BIGINT) AS rnk
            |FROM top10""".stripMargin)
      },
      Some("""WITH revenue AS (
             |  SELECT o_orderkey, c_mktsegment,
             |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS rev
             |  FROM customer JOIN orders ON c_custkey = o_custkey
             |  JOIN lineitem ON l_orderkey = o_orderkey
             |  WHERE c_mktsegment = 'BUILDING'
             |  GROUP BY o_orderkey, c_mktsegment)
             |SELECT o_orderkey, rev, rnk FROM (
             |  SELECT o_orderkey, rev,
             |    RANK() OVER (ORDER BY rev DESC, o_orderkey ASC) AS rnk
             |  FROM revenue)
             |WHERE rnk <= 10""".stripMargin)),

    // String-function pack (S2-S4 completeness): the same composition in
    // both engines, fingerprinted per row so every function's output is
    // value-checked.
    Q("q32_string_functions",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part.select(
          col("p_partkey"),
          md5(concat_ws("|",
            upper(col("p_name")),
            lpad(col("p_brand"), 12, "*"),
            rpad(col("p_brand"), 12, "-"),
            translate(col("p_type"), "aeiou", "01234"),
            repeat(col("p_brand"), 2),
            reverse(col("p_name")),
            regexp_replace(col("p_name"), " ", "_"),
            substring(col("p_name"), 3, 5),
            instr(col("p_name"), "o").cast("string"))).as("sig"))
      },
      Some("""SELECT p_partkey,
             |  md5(concat_ws('|',
             |    upper(p_name),
             |    lpad(p_brand, 12, '*'),
             |    rpad(p_brand, 12, '-'),
             |    translate(p_type, 'aeiou', '01234'),
             |    repeat(p_brand, 2),
             |    reverse(p_name),
             |    replace(p_name, ' ', '_'),
             |    substring(p_name, 3, 5),
             |    CAST(strpos(p_name, 'o') AS VARCHAR))) AS sig
             |FROM part""".stripMargin)),

    // INTERSECT / EXCEPT set operators: nations that have suppliers vs
    // customers.
    Q("q31_intersect_except",
      (s, dir) => {
        val t = Tables(s, dir)
        val suppNations = t.supplier.select(col("s_nationkey").as("nk"))
        val custNations = t.customer.select(col("c_nationkey").as("nk"))
        val both = suppNations.intersect(custNations)
          .withColumn("which", lit("both"))
        val custOnly = custNations.except(suppNations)
          .withColumn("which", lit("customers_only"))
        both.unionByName(custOnly)
      },
      Some("""SELECT nk, 'both' AS which FROM (
             |  SELECT s_nationkey AS nk FROM supplier
             |  INTERSECT SELECT c_nationkey FROM customer)
             |UNION ALL
             |SELECT nk, 'customers_only' FROM (
             |  SELECT c_nationkey AS nk FROM customer
             |  EXCEPT SELECT s_nationkey FROM supplier)""".stripMargin)),

    // String aggregation (LISTAGG/STRING_AGG surface; q17's set-agg emits
    // an ARRAY): per-region roster as ONE sorted delimited string.
    // collect_list's order is partition-arrival nondeterministic, so the
    // deterministic form is array_sort before array_join — mirrored by
    // DuckDB's string_agg ORDER BY.
    Q("q54_string_agg",
      (s, dir) => {
        val t = Tables(s, dir)
        t.nation.join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("n_nations"),
            array_join(array_sort(collect_list(col("n_name"))), ",")
              .as("nations_csv"))
      },
      Some("""SELECT r_name, COUNT(*) AS n_nations,
             |  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv
             |FROM nation JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name""".stripMargin)),

    // BAG-semantics set ops (q31 is the SET forms): EXCEPT ALL keeps the
    // multiplicity DIFFERENCE per value, INTERSECT ALL the minimum — on
    // nation keys both sides carry heavy duplication, so the distinction
    // is load-bearing here, not cosmetic. Rolled up to (nk, which, n) so
    // the multiset itself (not just its support) is what the hash checks.
    Q("q53_bag_set_ops",
      (s, dir) => {
        val t = Tables(s, dir)
        val suppNations = t.supplier.select(col("s_nationkey").as("nk"))
        val custNations = t.customer.select(col("c_nationkey").as("nk"))
        val excess = custNations.exceptAll(suppNations)
          .withColumn("which", lit("cust_excess"))
        val common = custNations.intersectAll(suppNations)
          .withColumn("which", lit("common_min"))
        excess.unionByName(common)
          .groupBy(col("nk"), col("which"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT nk, which, COUNT(*) AS n FROM (
             |  SELECT nk, 'cust_excess' AS which FROM (
             |    SELECT c_nationkey AS nk FROM customer
             |    EXCEPT ALL SELECT s_nationkey FROM supplier)
             |  UNION ALL
             |  SELECT nk, 'common_min' FROM (
             |    SELECT c_nationkey AS nk FROM customer
             |    INTERSECT ALL SELECT s_nationkey FROM supplier))
             |GROUP BY 1, 2""".stripMargin)),

    // Three-valued-logic semantics: NOT IN over a list containing NULL
    // matches nothing (per SQL), while NOT EXISTS gives the intuitive
    // answer — both engines must agree on both counts.
    Q("q34_not_in_null_semantics",
      (s, dir) => {
        val t = Tables(s, dir)
        t.customer.createOrReplaceTempView("customer")
        t.supplier.createOrReplaceTempView("supplier")
        s.sql(
          """SELECT 'not_in' AS form, COUNT(*) AS n FROM customer
            |WHERE c_nationkey NOT IN (SELECT nullif(s_nationkey, 3) FROM supplier)
            |UNION ALL
            |SELECT 'not_exists', COUNT(*) FROM customer
            |WHERE NOT EXISTS (SELECT 1 FROM supplier
            |  WHERE nullif(s_nationkey, 3) = c_nationkey)""".stripMargin)
      },
      Some("""SELECT 'not_in' AS form, COUNT(*) AS n FROM customer
             |WHERE c_nationkey NOT IN (SELECT nullif(s_nationkey, 3) FROM supplier)
             |UNION ALL
             |SELECT 'not_exists', COUNT(*) FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM supplier
             |  WHERE nullif(s_nationkey, 3) = c_nationkey)""".stripMargin)),

    // Correlated scalar subquery: parts priced above their brand average.
    Q("q20_above_brand_avg",
      (s, dir) => {
        val t = Tables(s, dir)
        t.part.createOrReplaceTempView("part")
        // decimal-exact mean (raw AVG(double) is parallel-sum-order
        // dependent and can differ from DuckDB in the last ulp)
        s.sql(
          """SELECT p_partkey, p_brand, p_retailprice FROM part p1
            |WHERE p_retailprice > 1.05 * (
            |  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            |  FROM part p2 WHERE p2.p_brand = p1.p_brand)""".stripMargin)
      },
      Some("""SELECT p_partkey, p_brand, p_retailprice FROM part p1
             |WHERE p_retailprice > 1.05 * (
             |  SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             |  FROM part p2 WHERE p2.p_brand = p1.p_brand)""".stripMargin)),

    // Correlated EXISTS (TPC-H Q4 shape): orders in a quarter with at least
    // one lineitem shipped after the order date. Catalyst decorrelates the
    // EXISTS into a left-semi join on l_orderkey — q20 covers the scalar
    // correlated form, this covers the semi-join form; together they are
    // the two decorrelation families.
    Q("q40_exists_subquery",
      (s, dir) => {
        val t = Tables(s, dir)
        t.orders.createOrReplaceTempView("orders")
        t.lineitem.createOrReplaceTempView("lineitem")
        s.sql(
          """SELECT o_orderpriority, COUNT(*) AS n
            |FROM orders o
            |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            |  AND o_orderdate < TIMESTAMP '1996-04-01'
            |  AND EXISTS (
            |    SELECT 1 FROM lineitem l
            |    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
            |GROUP BY o_orderpriority""".stripMargin)
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n
             |FROM orders o
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1996-04-01'
             |  AND EXISTS (
             |    SELECT 1 FROM lineitem l
             |    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
             |GROUP BY o_orderpriority""".stripMargin)),

    // LATERAL correlated subquery — per-brand top-2 parts by price through
    // the SQL LATERAL surface (the other decorrelation family next to
    // q40's EXISTS). Catalyst decorrelates the ORDER BY/LIMIT subquery
    // into a ranked window join — same physical shape as q11's window
    // top-N, arrived at from SQL; no per-brand re-execution.
    Q("q48_lateral_topn",
      (s, dir) => {
        Tables(s, dir).part.createOrReplaceTempView("part")
        s.sql(
          """SELECT b.p_brand, t.p_name, t.p_retailprice
            |FROM (SELECT DISTINCT p_brand FROM part) b,
            |LATERAL (
            |  SELECT p_name, p_retailprice FROM part x
            |  WHERE x.p_brand = b.p_brand
            |  ORDER BY p_retailprice DESC, p_name ASC LIMIT 2) t""".stripMargin)
      },
      Some("""SELECT b.p_brand, t.p_name, t.p_retailprice
             |FROM (SELECT DISTINCT p_brand FROM part) b,
             |LATERAL (
             |  SELECT p_name, p_retailprice FROM part x
             |  WHERE x.p_brand = b.p_brand
             |  ORDER BY p_retailprice DESC, p_name ASC LIMIT 2) t""".stripMargin)),
  )
}
