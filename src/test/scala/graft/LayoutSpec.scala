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

  test("compact rewrites a fragmented partitioned dataset into few files, content intact") {
    val root = tmpDir("compact_root")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    // fragment: 8 files per lang partition
    docs.repartition(8)
      .write.mode("overwrite").partitionBy("lang").parquet(root)
    def files(dir: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
        else if (f.getName.startsWith("_") || f.getName.startsWith(".")) Nil
        else Seq(f)
      walk(new java.io.File(dir))
    }
    val before = files(root).size
    val langs = docs.select("lang").distinct().count()
    val after = Layout.compact(spark, root, Seq("lang"),
      targetFileBytes = 1L << 30) // huge target → one file per partition
    assert(before > langs, s"fixture not fragmented: $before files")
    assert(after == langs, s"expected $langs files after compaction, got $after")
    assert(files(root).size == after)
    // content identical
    val back = spark.read.parquet(root).select("doc_id", "text", "lang")
    assert(back.count() == docs.count())
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }
}
