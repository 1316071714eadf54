package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.util.Tables

/** Multimodal plumbing declared over `documents` with text bytes standing in
  * for media payloads (the container has no codecs — see Multimodal's STUB
  * markers). The byte-level operations (lengths, hashes, frame slicing) are
  * real and oracle-checked against DuckDB's blob functions.
  */
object MultimodalQueries {

  val all: Seq[Q] = Seq(
    // Binary metadata extraction: byte length, content hash, stub dims.
    Q("mm01_media_meta",
      (s, dir) => {
        val t = Tables(s, dir)
        val withBin = t.documents.withColumn("payload", col("text").cast("binary"))
        Multimodal.withMediaMeta(withBin, "payload")
          .select(col("doc_id"),
            col("media_meta.byte_len").as("byte_len"),
            col("media_meta.content_hash").as("content_hash"),
            col("media_meta.width").as("width"),
            col("media_meta.height").as("height"))
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |  md5(text) AS content_hash,
             |  CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
             |  CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height
             |FROM documents""".stripMargin)),

    // Frame sampling: 16-byte frames, every 4th frame, per-frame hash.
    Q("mm02_frame_sample",
      (s, dir) => {
        val t = Tables(s, dir)
        val withBin = t.documents.withColumn("payload", col("text").cast("binary"))
        Multimodal.sampleFrames(withBin, "doc_id", "payload", frameBytes = 16, stride = 4)
      },
      Some("""WITH f AS (
             |  SELECT doc_id AS id,
             |    unnest(range(0, GREATEST(CAST(ceil(octet_length(encode(text)) / 16.0) AS INTEGER), 1))) AS frame_idx,
             |    text
             |  FROM documents)
             |SELECT id, CAST(frame_idx AS BIGINT) AS frame_idx,
             |  md5(substr(text, frame_idx * 16 + 1, 16)) AS frame_hash
             |FROM f WHERE frame_idx % 4 = 0""".stripMargin)),
  )
}
