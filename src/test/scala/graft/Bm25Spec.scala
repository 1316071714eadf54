package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Bm25

class Bm25Spec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def corpus(docs: Seq[(Long, String)]) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(docs.map(d => Row(d._1, d._2)), 3), schema)

  private def brute(docs: Seq[(Long, String)], q: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = docs.map { case (id, t) => id -> t.split("\\s+").toSeq }
    val n = docs.size.toDouble
    val avgdl = toks.map(_._2.size).sum / n
    toks.map { case (id, ts) =>
      val dl = ts.size.toDouble
      val score = q.map { term =>
        val tf = ts.count(_ == term).toDouble
        if (tf == 0) 0.0
        else {
          val df = toks.count(_._2.contains(term)).toDouble
          val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
          idf * ((tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl))))
        }
      }.sum
      id -> (math.rint(score * 1e6) / 1e6)
    }.toMap
  }

  test("bm25 matches a brute-force scorer and ranks rare terms above common ones") {
    val docs = Seq(
      1L -> "spark runs fast queries on spark clusters",
      2L -> "the cat sat on the mat",
      3L -> "fast queries need fast plans and fast scans",
      4L -> "spark fast spark fast spark",
      5L -> "nothing relevant here at all")
    val q = Seq("spark", "fast")
    val got = Bm25.search(corpus(docs), "doc_id", "text", q, topK = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = brute(docs, q)
    // docs 2 and 5 match nothing and must be absent
    assert(got.keySet == Set(1L, 3L, 4L), s"got ${got.keySet}")
    got.foreach { case (id, s) =>
      assert(math.abs(s - exp(id)) < 1e-9, s"doc $id: $s vs ${exp(id)}")
    }
    // the doc with both terms repeated dominates
    val top = Bm25.search(corpus(docs), "doc_id", "text", q, topK = 1)
      .collect().head.getLong(0)
    assert(top == 4L)
  }

  test("bm25 topK truncates on (score desc, id asc) deterministically") {
    // two identical docs tie exactly; the lower id survives a k=1 cut above
    // a weaker third doc
    val docs = Seq(
      7L -> "alpha beta",
      9L -> "alpha beta",
      3L -> "alpha gamma gamma gamma gamma gamma")
    val got = Bm25.search(corpus(docs), "doc_id", "text",
      Seq("alpha", "beta"), topK = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(got.toSet == Set(7L, 9L), s"tied pair expected, got $got")
  }

  test("bm25 rejects duplicate or empty query terms") {
    intercept[IllegalArgumentException] {
      Bm25.search(corpus(Seq(1L -> "x")), "doc_id", "text", Seq(), 5)
    }
    intercept[IllegalArgumentException] {
      Bm25.search(corpus(Seq(1L -> "x")), "doc_id", "text", Seq("a", "a"), 5)
    }
  }
}
