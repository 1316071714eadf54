package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  val media = Seq(
    (1L, "x" * 100),
    (2L, "y" * 33),
  ).toDF("id", "txt").withColumn("payload", col("txt").cast("binary"))

  test("withMediaMeta attaches typed metadata from binary payloads") {
    val m = Multimodal.withMediaMeta(media, "payload")
      .select("id", "media_meta.byte_len", "media_meta.width", "media_meta.height")
      .orderBy("id").collect()
    assert(m(0).getLong(1) == 100L && m(0).getInt(2) == 101 && m(0).getInt(3) == 101)
    assert(m(1).getLong(1) == 33L)
  }

  test("extractFeatures runs batched and is deterministic") {
    val ds = media.select(col("id"), col("payload"))
      .as[(Long, Array[Byte])]
    val f1 = Multimodal.extractFeatures(ds, dim = 8, batchSize = 1).collect().toMap
    val f2 = Multimodal.extractFeatures(ds, dim = 8, batchSize = 16).collect().toMap
    assert(f1.keySet == Set(1L, 2L))
    assert(f1(1L).length == 8)
    // batch size must not change results
    assert(f1(1L).toSeq == f2(1L).toSeq && f1(2L).toSeq == f2(2L).toSeq)
  }

  test("sampleFrames slices fixed-size frames with a stride") {
    val frames = Multimodal.sampleFrames(media, "id", "payload", frameBytes = 16, stride = 2)
      .orderBy("id", "frame_idx").collect()
    // id=1: 100 bytes → 7 frames → kept 0,2,4,6; id=2: 33 bytes → 3 frames → 0,2
    val byId = frames.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq).toMap
    assert(byId(1L) == Seq(0L, 2L, 4L, 6L))
    assert(byId(2L) == Seq(0L, 2L))
    // full frames of identical content hash identically; the trailing
    // partial frame (bytes 96..100) differs
    assert(frames.filter(_.getLong(0) == 1L).map(_.getString(2)).distinct.length == 2)
  }
}
