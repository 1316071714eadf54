package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Hybrid

class HybridSpec extends SparkSpec {

  // 8 docs: ids 0-7. Docs 1-4 contain the query terms with decreasing
  // density (lexical rank 1..4). Embeddings: vec 0 is the query; vecs
  // 3,5,6 point near it (vector ranks), the rest are near-orthogonal.
  private val dim = 4

  private def docs = {
    val texts = Seq(
      0L -> "query vector itself no terms here at all",
      1L -> "spark spark spark merge merge vector rich doc",
      2L -> "spark spark merge vector other words padding",
      3L -> "spark merge vector some more unrelated words",
      4L -> "spark alone in a long document of filler words",
      5L -> "nothing lexical in this one just prose",
      6L -> "plain text without the keywords anywhere",
      7L -> "also keyword free entirely")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(texts.map { case (i, t) => Row(i, t) }, 3),
      schema)
  }

  private def embs = {
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    val rows = Seq(
      0L -> v(1, 0, 0, 0),           // the query vector
      1L -> v(0, 1, 0, 0),
      2L -> v(0, 0, 1, 0),
      3L -> v(0.9, 0.1, 0, 0),       // vec rank 1
      4L -> v(0, 0, 0, 1),
      5L -> v(0.8, 0.2, 0, 0),       // vec rank 2
      6L -> v(0.7, 0.3, 0, 0),       // vec rank 3
      7L -> v(0, 0.5, 0.5, 0))
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, e) => Row(i, e) }, 3),
      schema)
  }

  private def run(topK: Int = 6, n: Int = 6) =
    Hybrid.rrfSearch(docs, embs, "doc_id", "text", "vec_id", "embedding",
      dim, Seq("spark", "merge", "vector"), queryVecId = 0L,
      n = n, topK = topK)

  test("rrf sums both lists' contributions and a both-list doc beats single-list peers") {
    val rows = run().collect().map(r =>
      (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3))).toSeq
    val byId = rows.map(r => r._1 -> r).toMap
    // doc 3 is on BOTH lists: lexical rank 3, vector rank 1
    val (_, lr3, vr3, rrf3) = byId(3L)
    assert(lr3.contains(3L) && vr3.contains(1L))
    assert(math.abs(rrf3 - math.rint((1.0 / 63 + 1.0 / 61) * 1e6) / 1e6) < 1e-9)
    // doc 1: lexical #1, but its zero-cosine vector only makes the list's
    // tail (rank 4 — the 0-cos ties order by id) — fuses BELOW doc 3
    val (_, lr1, vr1, rrf1) = byId(1L)
    assert(lr1.contains(1L) && vr1.contains(4L))
    assert(math.abs(rrf1 - math.rint((1.0 / 61 + 1.0 / 64) * 1e6) / 1e6) < 1e-9)
    assert(rrf3 > rrf1, s"doc 3 ($rrf3) must outrank doc 1 ($rrf1)")
    // the fused head is doc 3
    assert(rows.head._1 == 3L)
  }

  test("single-list docs carry one null rank and the exact 1/(k+r) score") {
    val rows = run().collect().map(r =>
      (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getDouble(3))).toSeq
    val byId = rows.map(r => r._1 -> r).toMap
    val (_, lr5, vr5, rrf5) = byId(5L) // vector-only, rank 2
    assert(lr5.isEmpty && vr5.contains(2L))
    assert(math.abs(rrf5 - math.rint(1.0 / 62 * 1e6) / 1e6) < 1e-9)
  }

  test("topK truncates by fused score with doc-id tie-break") {
    val top = run(topK = 3).collect()
    assert(top.length == 3)
    val scores = top.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
    // equal-score ties (lex-only rank r vs vec-only rank r) order by id:
    // doc 1 (lex #1) and doc 3's vec #1 both contribute 1/61 — but doc 3
    // fused higher; within the returned prefix ordering is deterministic
    val full = run().collect().map(_.getLong(0)).toSeq
    assert(full.take(3) == top.map(_.getLong(0)).toSeq)
  }
}
