package graft

import org.apache.spark.sql.functions._

import graft.operators.PrepPipeline
import graft.tools.GenXModalFixtures

/** The cross-modal pair-dedup rule (mm17): one pair per image-cluster ×
  * caption-cluster CELL — strictly finer than either side's dedup alone.
  */
class CrossModalSpec extends SparkSpec {

  private lazy val pairs = {
    val df = spark.createDataFrame(GenXModalFixtures.fixtures())
      .toDF("pair_id", "img_name", "payload", "caption")
    df
  }

  private lazy val labeled = PrepPipeline.crossModalDedup(pairs,
      "pair_id", "img_name", "payload", "caption",
      bands = 4, radius = 3, n = 3, numHashes = 12, rowsPerBand = 3,
      threshold = 0.8)
    .collect()
    .map(r => r.getLong(0) -> (Option(r.getString(1)),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
    .toMap

  test("every pair gets exactly one terminal label") {
    assert(labeled.size == GenXModalFixtures.fixtures().size)
  }

  test("a pair is dropped only when BOTH sides duplicate another pair's") {
    // the true cross-modal dup: image near-dup of 1 AND caption near-dup of 1
    assert(labeled(2L)._3 == "20_dropped_dup")
    // same image cluster as 1, genuinely new caption: a distinct training
    // signal — image-only dedup would wrongly drop this
    assert(labeled(3L)._3 == "30_kept")
    assert(labeled(3L)._1 == labeled(1L)._1, "3 shares 1's image cluster")
    assert(labeled(3L)._2 != labeled(1L)._2, "3 has its own caption cluster")
    // same caption cluster as 1, genuinely new image — caption-only dedup
    // would wrongly drop this
    assert(labeled(4L)._3 == "30_kept")
    assert(labeled(4L)._2 == labeled(1L)._2, "4 shares 1's caption cluster")
    assert(labeled(4L)._1 != labeled(1L)._1, "4 has its own image cluster")
    // 5 duplicates 4's cell (logo overlay image + extended caption), not 1's
    assert(labeled(5L)._3 == "20_dropped_dup")
    assert(labeled(5L)._1 == labeled(4L)._1 && labeled(5L)._2 == labeled(4L)._2)
    // each cell keeps its min pair id
    assert(labeled(1L)._3 == "30_kept" && labeled(6L)._3 == "30_kept" &&
      labeled(9L)._3 == "30_kept")
    assert(labeled(8L)._3 == "20_dropped_dup")
  }

  test("an undecodable image quarantines the pair and nulls both clusters") {
    assert(labeled(7L) == ((None, None, "10_quarantined_undecodable")))
    // its healthy caption must NOT have claimed the (C, capC) cell: pair 6
    // keeps it even though 6 < 7 would also hold — the quarantined pair
    // never competes
    assert(labeled(6L)._3 == "30_kept")
  }

  test("cluster canonical ids are members: min name / min pair id") {
    assert(labeled(1L)._1.contains("scene_a") && labeled(4L)._1.contains("scene_b"))
    assert(labeled(1L)._2.contains(1L) && labeled(6L)._2.contains(6L))
    // a caption with no near-dup clusters to its own pair id
    assert(labeled(9L)._2.contains(9L))
  }

  test("the committed fixture parquet matches the generator") {
    val committed = spark.read
      .parquet(graft.queries.MultimodalQueries.xmodalFixturePath)
      .orderBy("pair_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2).toSeq,
        r.getString(3)))
    val gen = GenXModalFixtures.fixtures()
      .map { case (id, n, b, c) => (id, n, b.toSeq, c) }
    assert(committed.toSeq == gen)
  }
}
