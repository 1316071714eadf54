package graft

import org.apache.spark.sql.functions._

/** The session-scoped source catalog in util.Tables: table() registers the
  * resolved parquet plan as a temp view once and re-serves it, so repeated
  * calls stop paying per-call file listing + footer schema inference. The
  * risky part of serving ONE plan to every caller is self-join resolution
  * (two calls used to get fresh expression IDs) — pinned here.
  */
class TablesSpec extends SparkSpec {

  test("repeated table() calls resolve through one session view") {
    val t = graft.util.Tables(spark, "/root/testdata/sf0.001")
    val a = t.orders
    val b = t.orders
    // the view exists and both frames carry the same schema + row count
    val views = spark.catalog.listTables().collect().map(_.name)
    assert(views.exists(_.startsWith("graft_src_")),
      "table() must register its resolved plan as a graft_src_* temp view")
    assert(a.schema == b.schema)
    assert(a.count() == b.count())
  }

  test("self-join of two table() calls resolves and computes correctly") {
    val t = graft.util.Tables(spark, "/root/testdata/sf0.001")
    // the m15-style pattern: the same source on both sides of an equi-join
    // with derived key columns (DeduplicateRelations must re-id one side)
    val left = t.orders.select(col("o_orderkey").as("k"),
      col("o_totalprice").as("pl"))
    val right = t.orders.select((col("o_orderkey") + 1).as("k"),
      col("o_totalprice").as("pr"))
    val joined = left.join(right, Seq("k"))
    val n = joined.count()
    assert(n > 0, "adjacent-key self-join through the shared view matches")
    // spot-check one value pair against a fresh read (no catalog)
    val fresh = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val expect = fresh.select(col("o_orderkey").as("k"), col("o_totalprice").as("pl"))
      .join(fresh.select((col("o_orderkey") + 1).as("k"),
        col("o_totalprice").as("pr")), Seq("k")).count()
    assert(n == expect)
  }

  test("catalog serves plans, not results: clearCache leaves views intact") {
    val t = graft.util.Tables(spark, "/root/testdata/sf0.001")
    val before = t.lineitem.count()
    spark.catalog.clearCache() // the bench's between-queries hygiene
    assert(graft.util.Tables(spark, "/root/testdata/sf0.001")
      .lineitem.count() == before)
  }
}
