package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Source-mixture resampling: exact factors, copy bounds, determinism. */
class MixtureSpec extends SparkSpec {
  import spark.implicits._

  test("single source at 100% target keeps exactly one copy per doc") {
    val docs = (1L to 50L).map(i => (i, "w " * 10, "a")).toDF("id", "text", "src")
    val out = Sampling.sourceMixture(docs, "id", "text", "src", Map("a" -> 10000))
    assert(out.filter(col("n_copies") =!= 1L).isEmpty)
  }

  test("equal-token sources at 75/25 target give factor 1.5 and 0.5") {
    val a = (1L to 40L).map(i => (i, "w " * 8, "a"))
    val b = (41L to 80L).map(i => (i, "w " * 8, "b"))
    val out = Sampling.sourceMixture((a ++ b).toDF("id", "text", "src"),
      "id", "text", "src", Map("a" -> 7500, "b" -> 2500)).cache()
    // factor_a = 1.5: every a-doc has 1 or 2 copies; factor_b = 0.5: 0 or 1
    val aCopies = out.filter(col("source") === "a").select("n_copies")
      .as[Long].collect()
    val bCopies = out.filter(col("source") === "b").select("n_copies")
      .as[Long].collect()
    assert(aCopies.forall(c => c == 1L || c == 2L))
    assert(bCopies.forall(c => c == 0L || c == 1L))
    // hash buckets are uniform enough over 40 ids that both rails appear
    assert(aCopies.toSet == Set(1L, 2L))
    assert(bCopies.toSet == Set(0L, 1L))
    out.unpersist()
  }

  test("mixture is deterministic across runs") {
    val docs = (1L to 30L).map(i => (i, "x " * (i.toInt % 7 + 1), s"s${i % 3}"))
      .toDF("id", "text", "src")
    val t = Map("s0" -> 5000, "s1" -> 3000, "s2" -> 2000)
    val r1 = Sampling.sourceMixture(docs, "id", "text", "src", t).collect().toSet
    val r2 = Sampling.sourceMixture(docs, "id", "text", "src", t).collect().toSet
    assert(r1 == r2)
  }

  test("a source missing from the targets fails loudly, not as NULL share") {
    val docs = Seq((1L, "w", "a"), (2L, "w", "web")).toDF("id", "text", "src")
    // typo'd key passes the sum check; the unlisted source must raise at
    // execution instead of silently dropping every 'web' doc
    val e = intercept[Exception] {
      Sampling.sourceMixture(docs, "id", "text", "src",
        Map("a" -> 5000, "web_" -> 5000)).collect()
    }
    assert(e.getMessage.contains("missing from targets") ||
      Option(e.getCause).exists(_.getMessage.contains("missing from targets")))
  }

  test("targets must sum to 10000 bp") {
    val docs = Seq((1L, "w", "a")).toDF("id", "text", "src")
    intercept[IllegalArgumentException] {
      Sampling.sourceMixture(docs, "id", "text", "src", Map("a" -> 9000))
    }
  }
}
