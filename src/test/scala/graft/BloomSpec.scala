package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bloom, Decontaminate}

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val K = 4
  private val M = 1 << 14

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bloom probe has no false negatives vs the exact overlap gate") {
    val eval = docs(1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "pack my box with five dozen liquor jugs")
    val train = docs(
      10L -> "the quick brown fox jumps over the lazy dog again today",
      11L -> "a completely different sentence about market data pipelines",
      12L -> "pack my box with five dozen liquor jugs said the mover")
    val bits = Bloom.build(eval, "text", n = 3, k = K, m = M)
    val bloom = Bloom.probeFlags(train, "doc_id", "text", 3, K, M, bits, 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exact = Decontaminate.overlapFlags(train, eval, "doc_id", "text", 3, 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // every exactly-overlapping shingle is "maybe" in the filter
    for ((id, nOverlap) <- exact)
      assert(bloom(id) >= nOverlap, s"doc $id: bloom ${bloom(id)} < exact $nOverlap")
    // the heavily-overlapping docs are flagged
    assert(bloom(10L) > 0 && bloom(12L) > 0)
  }

  test("merged per-source filters equal the filter of the union") {
    val a = docs(1L -> "alpha beta gamma delta epsilon zeta")
    val b = docs(2L -> "one two three four five six seven")
    val merged = Bloom.merge(
      Bloom.build(a, "text", 3, K, M), Bloom.build(b, "text", 3, K, M))
    val whole = Bloom.build(a.unionByName(b), "text", 3, K, M)
    assert(java.util.Arrays.equals(merged, whole))
  }

  test("probe runs unchanged on a stream (narrow, stateless, append-safe)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val eval = docs(1L -> "the quick brown fox jumps over the lazy dog")
    val bits = Bloom.build(eval, "text", 3, K, M)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = Bloom.probeFlags(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", 3, K, M, bits, 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("bloom_stream_out").start()
    in.addData(10L -> "the quick brown fox jumps over the lazy dog once more",
      11L -> "entirely unrelated words about spark catalyst plans")
    q.processAllAvailable()
    val out = spark.table("bloom_stream_out")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(10L) && !out(11L))
    // batch agreement: same filter, same flags
    val batch = Bloom.probeFlags(
        docs(10L -> "the quick brown fox jumps over the lazy dog once more",
          11L -> "entirely unrelated words about spark catalyst plans"),
        "doc_id", "text", 3, K, M, bits, 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out == batch)
    q.stop()
  }

  test("probe plan is join-free (narrow scan + one aggregation)") {
    val eval = docs(1L -> "the quick brown fox jumps over the lazy dog")
    val train = docs(10L -> "the quick brown fox jumps over the lazy dog too")
    val bits = Bloom.build(eval, "text", 3, K, M)
    val plan = Bloom.probeFlags(train, "doc_id", "text", 3, K, M, bits, 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"probe should not join:\n$plan")
  }
}
