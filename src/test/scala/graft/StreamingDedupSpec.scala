package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {

  private val base = "the quick brown fox jumps over the lazy dog again and " +
    "again while the market opens for daily fresh produce trading volume"
  private def nearDup(s: String) = s.replace("lazy", "sleepy")

  test("near-dup arriving in a later micro-batch pairs with the stored doc") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.candidatePairs(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 12, rowsPerBand = 3, minEstJaccard = 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_out").start()
    in.addData((1L, base), (2L, "completely different words about spark " +
      "shuffles partitions codegen catalyst tungsten optimizer plans"))
    q.processAllAvailable()
    assert(spark.table("sdedup_out").count() == 0) // nothing similar yet
    in.addData((101L, nearDup(base)))              // near-dup of doc 1
    q.processAllAvailable()
    val pairs = spark.table("sdedup_out")
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 101L)))
    // re-delivery of the same id must emit nothing new (idempotent)
    in.addData((101L, nearDup(base)))
    q.processAllAvailable()
    val after = spark.table("sdedup_out")
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == pairs)
    q.stop()
  }

  test("streaming candidates match the batch LSH operator on the same corpus") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val corpus = Seq((1L, base), (2L, nearDup(base)),
      (3L, "unrelated text full of other tokens nothing shared here at all " +
        "beyond sheer coincidence of english function words"))
    val batchPairs = Dedup.minhashLshPairs(
        corpus.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 12, rowsPerBand = 3, threshold = 0.5)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.candidatePairs(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 12, rowsPerBand = 3, minEstJaccard = 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_batch_cmp").start()
    corpus.foreach { d => in.addData(d); q.processAllAvailable() }
    val streamPairs = spark.table("sdedup_batch_cmp")
      .filter(!col("capped")).select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidates(stream, est-filtered) ⊇ batch verified pairs here:
    // the planted near-dup survives both; the unrelated doc pairs in neither
    assert(streamPairs == batchPairs)
    q.stop()
  }

  test("full bucket refuses new entries loudly instead of evicting history") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val q = StreamingDedup.candidatePairs(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        n = 3, numHashes = 12, rowsPerBand = 3, minEstJaccard = 0.5,
        maxPerBucket = 1)
      .writeStream.outputMode("append")
      .format("memory").queryName("sdedup_cap").start()
    in.addData((1L, base))
    q.processAllAvailable()
    in.addData((2L, nearDup(base))) // bucket already holds doc 1 -> refused
    q.processAllAvailable()
    val capped = spark.table("sdedup_cap").filter(col("capped"))
      .select("id_a").collect().map(_.getLong(0)).toSet
    assert(capped == Set(2L))
    // refused docs are recorded in state: RE-delivery of a refused doc is
    // silent (idempotency holds for refused docs, not just admitted ones;
    // the first refusal emits one marker per colliding band bucket)
    val markersAfterFirstRefusal =
      spark.table("sdedup_cap").filter(col("capped")).count()
    in.addData((2L, nearDup(base)))
    q.processAllAvailable()
    assert(spark.table("sdedup_cap").filter(col("capped")).count()
      == markersAfterFirstRefusal)
    q.stop()
  }
}
