package graft

import org.apache.spark.sql.functions._

import graft.util.Layout

/** Bucketed layout: a join between two tables bucketed on the join key must
  * plan with no shuffle (Exchange) on either side.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** saveAsTable location survives JVMs while catalog metadata doesn't —
    * clear both so reruns don't hit LOCATION_ALREADY_EXISTS.
    */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(s"spark-warehouse/$name"))
  }

  test("bucketed-by-key join plans without exchanges") {
    resetTable("li_bucketed")
    resetTable("o_bucketed")
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "li_bucketed", "l_orderkey", 4, Some("l_orderkey"))
    Layout.writeBucketed(o, "o_bucketed", "o_orderkey", 4, Some("o_orderkey"))

    val joined = Layout.readTable(spark, "li_bucketed")
      .join(Layout.readTable(spark, "o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // and it still computes the right thing
    assert(joined.count() ==
      li.join(o, col("l_orderkey") === col("o_orderkey")).count())

    // groupBy on the bucket key also avoids the exchange
    val agg = Layout.readTable(spark, "li_bucketed")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
  }
}
