package graft

import org.apache.spark.sql.functions._

import graft.ingest.Upsert
import graft.operators.Chunker

/** Round-5 additions: snapshot diff (CDC delta), boilerplate chunk
  * stripping, and the Markov-transition query's lead semantics.
  */
class DiffAndChunksSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed and names changed cols") {
    val old = Seq(
      (1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0), (4L, "D", 40.0))
      .toDF("k", "status", "price")
    val neu = Seq(
      (1L, "A", 10.0),            // unchanged → dropped
      (2L, "X", 20.0),            // status changed
      (3L, "C", 31.0),            // price changed
      (5L, "E", 50.0))            // added; 4 removed
      .toDF("k", "status", "price")
    val out = Upsert.snapshotDiff(old, neu, Seq("k"), Seq("status", "price"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq ==
      Seq((2L, "changed", "status"), (3L, "changed", "price"),
        (4L, "removed", ""), (5L, "added", "")))
  }

  test("snapshotDiff flags multiple changed columns comma-joined") {
    val old = Seq((1L, "A", 10.0)).toDF("k", "status", "price")
    val neu = Seq((1L, "B", 11.0)).toDF("k", "status", "price")
    val r = Upsert.snapshotDiff(old, neu, Seq("k"), Seq("status", "price")).head()
    assert(r.getAs[String]("change") == "changed")
    assert(r.getAs[String]("changed_cols") == "status,price")
  }

  test("snapshotDiff is null-safe: null -> value is a change, null -> null is not") {
    val old = Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
      .toDF("k", "status")
    val neu = Seq((1L, Option.empty[String]), (2L, Some("S")))
      .toDF("k", "status")
    val out = Upsert.snapshotDiff(old, neu, Seq("k"), Seq("status"))
      .collect()
    assert(out.length == 1 && out(0).getLong(0) == 2L)
  }

  test("stripSharedChunks removes cross-doc chunks, keeps unique ones in order") {
    // width=2 chunks; "b1 b2" is shared by docs 1 and 2 → stripped
    val docs = Seq(
      (1L, "b1 b2 u1 u2 u3"),
      (2L, "b1 b2 v1 v2"),
      (3L, "w1 w2"))
      .toDF("doc_id", "text")
    val out = Chunker.stripSharedChunks(docs, "doc_id", "text", width = 2, maxDocs = 1)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("clean_text")).toSeq ==
      Seq("u1 u2 u3", "v1 v2", "w1 w2"))
    assert(out.map(_.getAs[Long]("n_kept")).toSeq == Seq(2L, 1L, 1L))
    assert(out.map(_.getAs[Long]("n_chunks")).toSeq == Seq(3L, 2L, 1L))
  }

  test("stripSharedChunks: fully-boilerplate doc yields empty clean_text") {
    val docs = Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text")
    val out = Chunker.stripSharedChunks(docs, "doc_id", "text", 2, 1)
      .orderBy("doc_id").collect()
    assert(out.forall(_.getAs[String]("clean_text") == ""))
    assert(out.forall(_.getAs[Long]("n_kept") == 0L))
  }

  test("stripSharedChunks with maxDocs=2 keeps pair-shared chunks") {
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x y")).toDF("doc_id", "text")
    val out = Chunker.stripSharedChunks(docs, "doc_id", "text", 2, 2).collect()
    assert(out.forall(_.getAs[String]("clean_text") == "")) // shared by 3 > 2
    val out2 = Chunker.stripSharedChunks(
      docs.filter(col("doc_id") < 3), "doc_id", "text", 2, 2).collect()
    assert(out2.forall(_.getAs[String]("clean_text") == "x y"))
  }

  test("cdcDupStats: boundaries survive a prefix insertion (shift resilience)") {
    // doc 2 = doc 1 with 5 extra leading tokens. Fixed-width chunking
    // shifts every chunk and finds nothing shared; CDC boundaries re-align
    // after the window, so most of doc 1's chunks dedup against doc 2.
    val rnd = new scala.util.Random(7)
    val body = (1 to 200).map(_ => s"w${rnd.nextInt(500)}").mkString(" ")
    val docs = Seq((1L, body), (2L, "p0 p1 p2 p3 p4 " + body))
      .toDF("doc_id", "text")
    val cdc = Chunker.cdcDupStats(docs, "doc_id", "text", window = 4, divisor = 8)
      .orderBy("doc_id").collect()
    val cdcShared = cdc.map(r => (r.getAs[Long]("n_shared_chunks"),
      r.getAs[Long]("n_chunks")))
    // doc 1: the overwhelming majority of chunks re-found inside doc 2
    assert(cdcShared(0)._1.toDouble / cdcShared(0)._2 > 0.8,
      s"CDC should re-align after insertion, got $cdcShared")
    // fixed-width baseline on the same pair finds (almost) nothing
    val fixed = Chunker.dupChunkStats(docs, "doc_id", "text", width = 8)
      .orderBy("doc_id").collect()
    val f0 = fixed(0)
    assert(f0.getAs[Long]("n_shared_chunks") <
      cdcShared(0)._1 * f0.getAs[Long]("n_chunks") / cdcShared(0)._2,
      "fixed-width chunking should shift out of alignment where CDC does not")
  }

  test("cdcDupStats: chunk spans tile the token stream; empty docs vanish") {
    // two identical docs: every chunk is shared, so n_shared_tokens must
    // equal the full token count — only true if the spans tile [1, n]
    // with no gap and no overlap
    val body = (1 to 37).map("t" + _).mkString(" ")
    val docs = Seq((1L, body), (2L, body), (3L, "")).toDF("doc_id", "text")
    val out = Chunker.cdcDupStats(docs, "doc_id", "text", 4, 8)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    out.foreach { r =>
      assert(r.getAs[Long]("n_shared_chunks") == r.getAs[Long]("n_chunks"))
      assert(r.getAs[Long]("n_shared_tokens") == 37L)
      assert(r.getAs[Double]("dup_chunk_frac") == 1.0)
    }
  }
}
