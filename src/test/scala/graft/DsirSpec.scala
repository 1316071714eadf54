package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Dsir

class DsirSpec extends SparkSpec {

  /** A corpus where the target source speaks a disjoint vocabulary: docs
    * from "tgt" repeat target words; "bg" docs repeat background words; two
    * "mixed" docs lean one way each. DSIR must rank target-speak above
    * background-speak regardless of source label.
    */
  private def corpus() = {
    val rows = Seq(
      Row(1L, "tgt", "alpha beta gamma alpha beta gamma alpha beta"),
      Row(2L, "tgt", "beta gamma alpha beta gamma alpha beta gamma"),
      Row(3L, "bg", "noise filler junk noise filler junk noise filler"),
      Row(4L, "bg", "junk noise filler junk noise filler junk noise"),
      // mixed docs, NOT in the target source: 5 leans target, 6 leans bg
      Row(5L, "bg", "alpha beta gamma alpha filler"),
      Row(6L, "bg", "noise junk filler noise beta"),
      Row(7L, "bg", ""), // empty doc: no features, excluded from scoring
      Row(8L, "bg", "alpha alpha alpha alpha alpha alpha"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("target-vocabulary docs outrank background docs") {
    val got = Dsir.topByImportance(corpus(), "doc_id", "text", "source",
      targetSource = "tgt", buckets = 64, topK = 8).collect()
    val score = got.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the empty doc has no features and is absent
    assert(!score.contains(7L), "empty doc must be excluded")
    assert(score.size == 7)
    // every pure-target doc beats every pure-background doc
    for (t <- Seq(1L, 2L, 8L); b <- Seq(3L, 4L))
      assert(score(t) > score(b), s"doc $t should outrank doc $b")
    // the target-leaning mixed doc beats the background-leaning one
    assert(score(5L) > score(6L))
  }

  test("topK truncates by score with doc_id tie-break, deterministically") {
    val a = Dsir.topByImportance(corpus(), "doc_id", "text", "source",
      "tgt", buckets = 64, topK = 3).collect().map(_.getLong(0)).toSeq
    val b = Dsir.topByImportance(corpus(), "doc_id", "text", "source",
      "tgt", buckets = 64, topK = 3).collect().map(_.getLong(0)).toSeq
    assert(a == b, "selection must be deterministic across runs")
    assert(a.size == 3)
    val all = Dsir.topByImportance(corpus(), "doc_id", "text", "source",
      "tgt", buckets = 64, topK = 8).collect()
      .sortBy(r => (-r.getDouble(2), r.getLong(0))).map(_.getLong(0)).take(3)
    assert(a.sorted == all.sorted.toSeq, "topK must be the global top-3")
  }

  test("serveScores equals the batch scorer bit for bit (exact decimal fold)") {
    val docs = corpus()
    val w = Dsir.trainWeights(docs, "doc_id", "text", "source", "tgt", buckets = 64)
    assert(w.size <= 64)
    val served = Dsir.serveScores(docs, "doc_id", "text", w, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val batch = Dsir.topByImportance(docs, "doc_id", "text", "source",
      "tgt", buckets = 64, topK = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // per-occurrence fold vs per-bucket cnt·w: same exact decimal sum
    for ((id, s) <- batch) assert(served(id) == s, s"doc $id: $s vs ${served(id)}")
    // the empty doc scores 0 on the serve path (no tokens folded)
    assert(served(7L) == 0.0)
  }

  test("serveScores runs on a stream across micro-batches; OOV is neutral") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = corpus()
    val w = Dsir.trainWeights(docs, "doc_id", "text", "source", "tgt", buckets = 64)
    val in = MemoryStream[(Long, String)]
    val q = Dsir.serveScores(in.toDF().toDF("doc_id", "text"),
        "doc_id", "text", w, buckets = 64)
      .writeStream.outputMode("append")
      .format("memory").queryName("dsir_serve_out").start()
    in.addData((1L, "alpha beta gamma alpha beta gamma alpha beta"))
    q.processAllAvailable()
    in.addData((3L, "noise filler junk noise filler junk noise filler"),
      (99L, "zzz unseen vocabulary entirely")) // OOV-only doc
    q.processAllAvailable()
    val got = spark.table("dsir_serve_out")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    q.stop()
    val batch = Dsir.topByImportance(docs, "doc_id", "text", "source",
      "tgt", buckets = 64, topK = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) == batch(1L), "stream score must equal batch score")
    assert(got(3L) == batch(3L))
    // fully-unseen vocabulary scores exactly 0 unless its hash buckets
    // collide with trained ones (64 buckets: tolerate collision weight)
    assert(got.contains(99L))
  }

  test("gumbel resample is deterministic, weight-tilted, and keeps scores") {
    val g1 = Dsir.gumbelResample(corpus(), "doc_id", "text", "source",
      "tgt", buckets = 64, topK = 4).collect()
    val g2 = Dsir.gumbelResample(corpus(), "doc_id", "text", "source",
      "tgt", buckets = 64, topK = 4).collect()
    assert(g1.map(_.getLong(0)).toSeq == g2.map(_.getLong(0)).toSeq,
      "hash-seeded Gumbel draw must be identical across runs")
    // keys are finite (u strictly interior) and the sample leans target:
    // at least half the draw comes from the three pure-target-vocab docs.
    assert(g1.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    val tgtHits = g1.map(_.getLong(0)).count(Seq(1L, 2L, 8L).contains)
    assert(tgtHits >= 2, s"expected a target-tilted sample, got $tgtHits/4")
    // the perturbed key never reorders by more than the Gumbel spread:
    // sanity — each emitted row carries its unperturbed score too
    assert(g1.forall(_.length == 4))
  }

  test("drift monitor fires on a shifted target domain, stays quiet in-distribution") {
    import spark.implicits._
    val docs = corpus()
    val (dist, tot) = Dsir.trainDist(docs, "text", buckets = 64)
    assert(tot > 0 && dist.values.sum == tot)
    // measure both statistics first (threshold out of reach), then pick
    // the trigger at the midpoint — on a toy corpus the absolute values
    // are small, the SEPARATION is the contract
    val inBatch = docs.filter(org.apache.spark.sql.functions.col("doc_id") <= 4)
    val quietChi2 = Dsir.driftStat(inBatch, "text", dist, tot, 64,
      threshold = Double.MaxValue, label = "in").collect()(0).getLong(2)
    // shifted domain: a vocabulary the trained model has never seen —
    // every token lands in an unseen (R=1) bucket
    val shifted = Seq.tabulate(6)(i =>
      s"zz${i}q wobble$i frobnicate$i zz${i}q wobble$i").toDF("text")
    val firedChi2 = Dsir.driftStat(shifted, "text", dist, tot, 64,
      threshold = Double.MaxValue, label = "shift").collect()(0).getLong(2)
    assert(firedChi2 > 5 * quietChi2,
      s"shifted chi2 $firedChi2 should dominate in-distribution $quietChi2")
    val mid = (quietChi2 + firedChi2) / 2 / 1e6 // micro-units → threshold
    assert(!Dsir.driftStat(inBatch, "text", dist, tot, 64, mid, "in")
      .collect()(0).getBoolean(3), "in-distribution batch fired")
    assert(Dsir.driftStat(shifted, "text", dist, tot, 64, mid, "shift")
      .collect()(0).getBoolean(3), "shifted batch did not fire")
    // the monitor scores BATCH FRAMES — the foreachBatch serving shape:
    // feeding the same micro-batch twice gives the identical statistic
    val again = Dsir.driftStat(shifted, "text", dist, tot, 64,
      Double.MaxValue, "shift").collect()(0)
    assert(again.getLong(2) == firedChi2)
    // loud precondition: an empty batch has no distribution to test
    val e = intercept[IllegalArgumentException] {
      Dsir.driftStat(Seq.empty[String].toDF("text"), "text", dist, tot, 64,
        500.0, "empty")
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("drift monitor serves a STREAM via foreachBatch and fires mid-stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = corpus()
    val (dist, tot) = Dsir.trainDist(docs, "text", buckets = 64)
    // threshold between the measured statistics (the batch test's contract)
    val quiet = Dsir.driftStat(docs.filter(
        org.apache.spark.sql.functions.col("doc_id") <= 4),
      "text", dist, tot, 64, Double.MaxValue, "in").collect()(0).getLong(2)
    val shifted = Seq.tabulate(6)(i =>
      s"zz${i}q wobble$i frobnicate$i zz${i}q wobble$i").toDF("text")
    val fired = Dsir.driftStat(shifted, "text", dist, tot, 64,
      Double.MaxValue, "shift").collect()(0).getLong(2)
    val mid = (quiet + fired) / 2 / 1e6
    // the monitor IS the foreachBatch body: per micro-batch one bounded
    // statistic row — the retrain trigger for the online serve path
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Boolean)]
    val in = MemoryStream[String]
    val q = in.toDF().toDF("text").writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        if (!batch.isEmpty) {
          val r = Dsir.driftStat(batch, "text", dist, tot, 64, mid,
            s"batch_$batchId").collect()(0)
          results.synchronized { results += ((batchId, r.getBoolean(3))) }
          ()
        }
      }.start()
    in.addData("alpha beta gamma alpha beta", "noise filler junk noise")
    q.processAllAvailable()
    in.addData(Seq.tabulate(6)(i =>
      s"zz${i}q wobble$i frobnicate$i zz${i}q wobble$i"): _*)
    q.processAllAvailable()
    q.stop()
    val byBatch = results.toMap
    assert(byBatch.size == 2)
    assert(!byBatch(0L), "in-distribution micro-batch fired")
    assert(byBatch(1L), "shifted micro-batch did not fire")
  }
}
