package graft

import org.apache.spark.sql.functions._

import graft.operators.SpanDedup

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  // shared 10-token passage planted at DIFFERENT offsets in docs 0 and 1
  private val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  val docs = Seq(
    (0L, s"intro words here $passage trailing tail tokens"),
    (1L, s"$passage completely different ending material follows now"),
    (2L, "nothing repeats in this document at all whatsoever today"),
  ).toDF("doc_id", "text")

  test("dupSpans finds the planted cross-doc passage at both offsets") {
    val spans = SpanDedup.dupSpans(docs, "doc_id", "text", width = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 0: passage occupies tokens 4..13 → dup 8-grams at pos 4..6
    //        → span [4, 6+7] = [4, 13]
    // doc 1: passage at tokens 1..10 → grams 1..3 → span [1, 10]
    assert(spans == Set((0L, 4L, 13L), (1L, 1L, 10L)), spans)
  }

  test("spans within gap <= width merge into one maximal run") {
    // one doc, passage repeated twice back-to-back inside it + a partner
    // doc: coverage overlaps/touches, so the whole region is ONE span
    val rep = Seq(
      (0L, s"$passage $passage"),
      (1L, s"$passage unrelated suffix words appear here after")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.dupSpans(rep, "doc_id", "text", width = 8)
      .filter(col("doc_id") === 0L).collect()
    assert(spans.length == 1)
    assert(spans.head.getLong(1) == 1L && spans.head.getLong(2) == 20L)
  }

  test("unique corpus yields no spans") {
    val unique = Seq(
      (0L, "one two three four five six seven eight nine ten"),
      (1L, "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen"))
      .toDF("doc_id", "text")
    assert(SpanDedup.dupSpans(unique, "doc_id", "text", 8).isEmpty)
  }

  test("stripDupSpans removes exactly the spanned tokens, others intact") {
    val out = SpanDedup.stripDupSpans(docs, "doc_id", "text", width = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) == "intro words here trailing tail tokens")
    assert(out(1L) == "completely different ending material follows now")
    assert(out(2L) == "nothing repeats in this document at all whatsoever today")
    // the cleaned corpus has no duplicated 8-gram left
    val again = SpanDedup.dupSpans(
      out.toSeq.toDF("doc_id", "text_clean"), "doc_id", "text_clean", 8)
    assert(again.isEmpty)
  }
}
