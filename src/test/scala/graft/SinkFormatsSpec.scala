package graft

import org.apache.spark.sql.functions._

import graft.ingest.MarketPipeline
import graft.sources.HtmlTable

/** Sink/source format coverage beyond the defaults: JSON and ORC round-trips
  * of the raw layer, and schema evolution on read (mergeSchema) for the
  * header-drift case.
  */
class SinkFormatsSpec extends SparkSpec {

  val html: String =
    """<table class="alltable"><thead>
      |<th class="header">Container</th><th class="header">Price (R)</th></thead>
      |<tbody><tr><td class="tleft2">Bag</td><td class="tleft">5.00</td></tr></tbody></table>""".stripMargin

  def frame(commodity: String) = MarketPipeline.enrich(
    HtmlTable.ingest(spark, html), "2026-08-12", commodity, "summary", "r1")

  test("raw layer round-trips through json and orc sinks") {
    for (fmt <- Seq("json", "orc")) {
      val root = tmpDir(s"fmt_$fmt")
      MarketPipeline.writeRaw(frame("apples"), root, fmt)
      val back = MarketPipeline.readRaw(spark, root, fmt)
      assert(back.count() == 1, fmt)
      assert(back.select("Container").head().getString(0) == "Bag", fmt)
      assert(back.select("commodity").head().getString(0) == "apples", fmt)
    }
  }

  test("training-shard export: deterministic, lossless, one file per shard") {
    import graft.functions.TextFns
    val docs = spark.range(0, 200).selectExpr("id AS doc_id",
      "concat('word', CAST(id AS STRING), ' alpha beta') AS text")
    val n = 8
    def export(root: String): Unit = docs
      .withColumn("shard", pmod(TextFns.md5Hash32(col("doc_id").cast("string")), lit(n.toLong)))
      .withColumn("n_tokens", TextFns.tokenCount(col("text")))
      .repartition(n, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(root)
    val r1 = tmpDir("shards_a"); val r2 = tmpDir("shards_b")
    export(r1); export(r2)
    val m1 = spark.read.parquet(r1).groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("ck"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val m2 = spark.read.parquet(r2).groupBy("shard")
      .agg(count(lit(1)).as("n"), sum("doc_id").as("ck"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(m1 == m2, "re-export must land identically (deterministic sharding)")
    // lossless: every doc comes back exactly once
    assert(m1.map(_._2).sum == 200L)
    assert(m1.map(_._3).sum == (0L until 200L).sum)
    // all shards populated and roughly balanced under the uniform hash
    assert(m1.size == n)
    assert(m1.map(_._2).max <= 3L * m1.map(_._2).min,
      s"shard skew too high: ${m1.map(_._2)}")
    // repartition-by-shard layout: exactly one data file per shard dir
    for (d <- new java.io.File(r1).listFiles() if d.getName.startsWith("shard=")) {
      val files = d.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${d.getName} has $files files, want 1")
    }
  }

  test("mergeSchema reads evolving parquet schemas (header drift across days)") {
    val root = tmpDir("evolve")
    import spark.implicits._
    Seq(("Bag", "5.00")).toDF("Container", "Price")
      .write.parquet(s"$root/day=1")
    Seq(("Box", "6.00", "7")).toDF("Container", "Price", "Qty")
      .write.parquet(s"$root/day=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(root)
    assert(merged.columns.toSet == Set("Container", "Price", "Qty", "day"))
    assert(merged.filter(col("day") === 1 && col("Qty").isNull).count() == 1)
    assert(merged.count() == 2)
  }
}
