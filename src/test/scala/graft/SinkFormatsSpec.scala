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
