package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Streaming twin of the m11 training-shard export: documents arrive on a
  * file stream and land as hash-sharded partitioned parquet through the
  * exactly-once streaming file sink — the production landing pattern for
  * continuously-collected training data. Kill/restart mid-stream must not
  * duplicate or drop a document: the sink's batch-id metadata log makes a
  * replayed interrupted batch idempotent, and the shard assignment is a
  * pure hash of the doc id, so a replay lands every row in the same shard.
  */
class StreamingShardSpec extends SparkSpec {

  test("streaming shard export survives kill/restart; manifest equals batch") {
    import spark.implicits._
    val docs = (0L until 300L)
      .map(i => (i, s"alpha w${i % 29} w${(i * 11) % 31} beta"))
    val src = tmpDir("shardstream_src")
    val ckpt = tmpDir("shardstream_ckpt")
    val out = tmpDir("shardstream_out")
    // 6 source files with distinct mtimes → deterministic micro-batch order
    docs.grouped(50).foreach { g =>
      g.toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100)
    }
    val n = 8
    def start() = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1).parquet(src)
      .withColumn("shard",
        pmod(TextFns.md5Hash32(col("doc_id").cast("string")), lit(n.toLong)))
      .withColumn("n_tokens", TextFns.tokenCount(col("text")))
      .writeStream.outputMode("append").format("parquet")
      .partitionBy("shard")
      .option("checkpointLocation", ckpt).option("path", out).start()
    // run ~2 micro-batches, then kill; the interrupted batch replays on
    // restart and the file sink's metadata log suppresses the duplicate
    val q1 = start()
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.length < 2 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    q1.stop(); q1.awaitTermination()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop(); q2.awaitTermination()
    // reading the sink dir goes THROUGH _spark_metadata: the exactly-once
    // committed view, not whatever part-files exist on disk
    val landed = spark.read.parquet(out)
    assert(landed.count() == 300, "every doc exactly once across the restart")
    val manifest = landed.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("ck"),
        sum("n_tokens").as("tok"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    val batch = docs.toDF("doc_id", "text")
      .withColumn("shard",
        pmod(TextFns.md5Hash32(col("doc_id").cast("string")), lit(n.toLong))
          .cast("int"))
      .withColumn("n_tokens", TextFns.tokenCount(col("text")))
      .groupBy("shard").agg(count(lit(1)).as("n_docs"),
        sum("doc_id").as("ck"), sum("n_tokens").as("tok"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(manifest == batch,
      "streaming landing must equal the batch export shard for shard")
  }
}
