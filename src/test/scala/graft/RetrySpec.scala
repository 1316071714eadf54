package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Dsir}

/** Task-retry invariance: on a 1000-executor cluster, failed and
  * speculative task attempts are constant background noise — every
  * operator must produce byte-identical results when an attempt dies and
  * the task re-runs. The session runs `local[4, 2]` (two attempts), and
  * these tests inject a REAL first-attempt failure (partition 0, attempt 0
  * of the scan stage) into the lineage, then assert the pipeline output
  * equals the clean run. This is the execution-model half of the
  * determinism story — the oracle hash gate proves plans are
  * order-independent; this proves they are replay-independent.
  */
class RetrySpec extends SparkSpec {

  private def docs = {
    import spark.implicits._
    (0L until 400L)
      .map(i => (i, s"src${i % 4}", s"alpha w${i % 37} w${(i * 7) % 41} beta"))
      .toDF("doc_id", "source", "text")
  }

  /** Throws on the FIRST attempt of partition 0 of whatever stage runs
    * this map — the retried attempt passes rows through untouched. The
    * JVM-static counter proves the failure actually fired (an accumulator
    * would not: updates from FAILED tasks are discarded by design; local
    * mode runs tasks in-process, so a static is visible).
    */
  private def flaky(ds: Dataset[(Long, String, String)]): Dataset[(Long, String, String)] =
    ds.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        RetrySpec.fired.incrementAndGet()
        throw new RuntimeException("injected: first attempt of partition 0")
      }
      it
    }(ds.encoder)

  test("aggregation, dedup, and DSIR results are invariant under task retry") {
    import spark.implicits._
    val clean = docs
    val shaky = flaky(docs.as[(Long, String, String)]).toDF(
      "doc_id", "source", "text")

    // plain shuffle aggregation
    val aggClean = clean.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val aggShaky = shaky.groupBy("source").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(aggShaky == aggClean)

    // LSH near-dup drop (multi-stage: signatures, bands, verify join)
    val dedupClean = Dedup.dropNearDuplicates(clean, "doc_id", "text",
      n = 2, numHashes = 8, rowsPerBand = 2, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val dedupShaky = Dedup.dropNearDuplicates(shaky, "doc_id", "text",
      n = 2, numHashes = 8, rowsPerBand = 2, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dedupShaky == dedupClean)

    // DSIR: driver-side training collect + fold scoring + TakeOrdered
    val dsirClean = Dsir.topByImportance(clean, "doc_id", "text", "source",
      "src0", buckets = 64, topK = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val dsirShaky = Dsir.topByImportance(shaky, "doc_id", "text", "source",
      "src0", buckets = 64, topK = 20).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(dsirShaky == dsirClean)

    // the injection must have actually fired (at least one retried task)
    assert(RetrySpec.fired.get() >= 1,
      "no failure was injected — the test proved nothing")
  }
}

object RetrySpec {
  val fired = new java.util.concurrent.atomic.AtomicInteger(0)
}
