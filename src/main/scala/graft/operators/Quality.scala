package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint audit — the Deequ-style check suite
  * a pipeline runs before promoting a batch: uniqueness, completeness
  * (not-null), referential integrity, value ranges, accepted-value domains.
  * Output is one row per check: (check, violations, total).
  *
  * Plan shape (the part that matters at 100 TB): all checks against one
  * table fold into ONE aggregation over ONE scan — each check is a
  * conditional count inside the same agg — then a zero-cost explode of the
  * 1-row result into the report rows. A naive per-check union would scan
  * the fact table once per check. Referential integrity is the one check
  * that genuinely needs a join (left_anti on the key); its violation count
  * rides the same report. Uniqueness uses count−countDistinct in the same
  * aggregation (Catalyst plans the distinct via Expand over the single
  * scan, still one pass over the data).
  */
object Quality {

  /** One report row spec: (check name, violation count, total count). */
  final case class Check(name: String, violations: Column, total: Column)

  /** Explode a 1-row aggregated frame into (check, violations, total)
    * report rows — no extra scan, no union of scans.
    */
  def report(agged: DataFrame, checks: Seq[Check]): DataFrame =
    agged.select(explode(array(checks.map { c =>
        struct(lit(c.name).as("check"),
          c.violations.cast("long").as("violations"),
          c.total.cast("long").as("total"))
      }: _*)).as("r"))
      .select(col("r.check").as("check"), col("r.violations").as("violations"),
        col("r.total").as("total"))

  /** The declared audit over the star schema's fact tables: PK uniqueness
    * and status domain on orders, discount/quantity ranges on lineitem,
    * lineitem→orders referential integrity. One scan of orders, one scan
    * of lineitem, one anti-join.
    */
  def audit(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val o = orders.agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_orderkey")).as("dk"),
      count(when(col("o_custkey").isNull, 1)).as("null_ck"),
      count(when(!col("o_orderstatus").isin("O", "F", "P"), 1)).as("bad_status"),
      // deliberately tight bound: exercises the nonzero-violation path on
      // clean data (an audit that can only ever print zeros proves little)
      count(when(col("o_totalprice") > 100000.0, 1)).as("over_100k"))
    val l = lineitem.agg(
      count(lit(1)).as("n"),
      count(when(col("l_discount") < 0 || col("l_discount") > 1, 1))
        .as("bad_disc"),
      count(when(col("l_quantity") <= 0, 1)).as("bad_qty"))
    val orphans = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("orphans"))
    val oReport = report(o, Seq(
      Check("orders.o_orderkey.unique", col("n") - col("dk"), col("n")),
      Check("orders.o_custkey.not_null", col("null_ck"), col("n")),
      Check("orders.o_orderstatus.in_O_F_P", col("bad_status"), col("n")),
      Check("orders.o_totalprice.le_100k", col("over_100k"), col("n"))))
    val lReport = report(l.crossJoin(broadcast(orphans)), Seq(
      Check("lineitem.l_discount.in_0_1", col("bad_disc"), col("n")),
      Check("lineitem.l_quantity.positive", col("bad_qty"), col("n")),
      Check("lineitem.l_orderkey.fk_orders", col("orphans"), col("n"))))
    oReport.unionAll(lReport)
  }

  /** DuckDB mirror of [[audit]]. */
  def auditSql: String =
    """WITH o AS (
      |  SELECT COUNT(*) AS n, COUNT(DISTINCT o_orderkey) AS dk,
      |    COUNT(*) FILTER (WHERE o_custkey IS NULL) AS null_ck,
      |    COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')) AS bad_status,
      |    COUNT(*) FILTER (WHERE o_totalprice > 100000.0) AS over_100k
      |  FROM orders),
      |l AS (
      |  SELECT COUNT(*) AS n,
      |    COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS bad_disc,
      |    COUNT(*) FILTER (WHERE l_quantity <= 0) AS bad_qty
      |  FROM lineitem),
      |orph AS (
      |  SELECT COUNT(*) AS orphans FROM lineitem
      |  WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
      |rep AS (
      |  SELECT 'orders.o_orderkey.unique' AS check_name,
      |    n - dk AS violations, n AS total FROM o
      |  UNION ALL SELECT 'orders.o_custkey.not_null', null_ck, n FROM o
      |  UNION ALL SELECT 'orders.o_orderstatus.in_O_F_P', bad_status, n FROM o
      |  UNION ALL SELECT 'orders.o_totalprice.le_100k', over_100k, n FROM o
      |  UNION ALL SELECT 'lineitem.l_discount.in_0_1', bad_disc, n FROM l
      |  UNION ALL SELECT 'lineitem.l_quantity.positive', bad_qty, n FROM l
      |  UNION ALL SELECT 'lineitem.l_orderkey.fk_orders',
      |    (SELECT orphans FROM orph), n FROM l)
      |SELECT check_name AS "check", violations, total FROM rep""".stripMargin
}
