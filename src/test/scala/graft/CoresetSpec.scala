package graft

import scala.util.Random

import graft.operators.Coreset

class CoresetSpec extends SparkSpec {

  test("kCenterSample: picks spread-out points, not cluster members") {
    import spark.implicits._
    // Three tight clusters along distinct axes + the seed; k=3 must take
    // one point per direction instead of two from the same cluster.
    val corpus = Seq(
      (1L, Array(1.0f, 0.01f, 0f, 0f)),
      (2L, Array(1.0f, 0.02f, 0f, 0f)),   // near-dup of 1
      (10L, Array(0f, 1.0f, 0.01f, 0f)),
      (11L, Array(0f, 1.0f, 0.02f, 0f)),  // near-dup of 10
      (20L, Array(0f, 0f, 0.01f, 1.0f))
    ).toDF("id", "vec")
    val got = Coreset.kCenterSample(corpus, "id", "vec", dim = 4, k = 3)
      .orderBy("pick_rank")
      .select("center_id").as[Long].collect().toSeq
    assert(got.head == 1L, got)            // deterministic lowest-id seed
    // one id from each direction, never two near-dups
    assert(!(got.contains(1L) && got.contains(2L)), got)
    assert(!(got.contains(10L) && got.contains(11L)), got)
    assert(got.toSet.intersect(Set(10L, 11L)).size == 1, got)
    assert(got.contains(20L), got)
  }

  test("kCenterSample: equals brute-force greedy on random corpora") {
    import spark.implicits._
    val rnd = new Random(7)
    val dim = 8
    val n = 40
    val data = (0 until n).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    }
    val got = Coreset.kCenterSample(data.toDF("id", "vec"), "id", "vec",
        dim, k = 6)
      .orderBy("pick_rank")
      .as[(Long, Long, Double)].collect().toSeq

    // brute-force greedy k-center, same seed/tie rules
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val norms = data.map { case (_, v) => math.sqrt(dot(v, v)) }.toArray
    var picked = List(0)
    val exp = collection.mutable.Buffer((0L, 1L, 0.0))
    for (step <- 2 to 6) {
      val cands = data.indices.filterNot(picked.contains)
      val scored = cands.map { i =>
        val ms = picked.map { j =>
          dot(data(i)._2, data(j)._2) / (norms(i) * norms(j))
        }.max
        (i, ms)
      }
      val (bi, bs) = scored.minBy { case (i, s) => (s, data(i)._1) }
      picked ::= bi
      exp += ((data(bi)._1, step.toLong, bs))
    }
    assert(got.map(r => (r._1, r._2)) == exp.map(r => (r._1, r._2)).toSeq, got)
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-12, s"$g vs $e")
    }
  }

  test("kCenterSample: k > n returns n rows") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Array(1.0f, 0f)), (2L, Array(0f, 1.0f))).toDF("id", "vec")
    val got = Coreset.kCenterSample(corpus, "id", "vec", dim = 2, k = 5)
    assert(got.count() == 2L)
  }
}
