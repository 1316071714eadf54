package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, GraphRank}

/** Hierarchy flattening (pointer doubling) and contamination provenance. */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  test("flattenHierarchy resolves a deep chain with correct depths") {
    // chain 1 <- 2 <- 3 <- ... <- 9 (8 hops) plus a star 100 <- {101,102}
    val chain = (2L to 9L).map(i => (i, i - 1))
    val star = Seq((101L, 100L), (102L, 100L))
    val out = GraphRank.flattenHierarchy(
      (chain ++ star).toDF("child", "parent"), "child", "parent")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(9L) == ((1L, 8L)))
    assert(out(5L) == ((1L, 4L)))
    assert(out(1L) == ((1L, 0L)))
    assert(out(101L) == ((100L, 1L)))
    assert(out(100L) == ((100L, 0L)))
  }

  test("flattenHierarchy trips loudly on a cycle") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("child", "parent")
    val e = intercept[IllegalArgumentException] {
      GraphRank.flattenHierarchy(cyc, "child", "parent", maxRounds = 4)
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("flattenHierarchy trips on power-of-two cycles that self-converge") {
    // 2- and 4-cycles become fixed points under pointer doubling (every
    // member ends as its own ancestor), so the non-convergence guard never
    // fires — the post-convergence root check must catch them instead.
    for (cycle <- Seq(Seq((1L, 2L), (2L, 1L)),
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))) {
      val e = intercept[IllegalArgumentException] {
        GraphRank.flattenHierarchy(
          cycle.toDF("child", "parent"), "child", "parent")
      }
      assert(e.getMessage.contains("cycle"), s"len-${cycle.size} cycle")
    }
    // and a cycle hanging off a healthy forest is still caught
    val mixed = (Seq((1L, 2L), (2L, 1L)) ++ Seq((11L, 10L), (12L, 11L)))
      .toDF("child", "parent")
    val e2 = intercept[IllegalArgumentException] {
      GraphRank.flattenHierarchy(mixed, "child", "parent")
    }
    assert(e2.getMessage.contains("cycle"))
  }

  test("provenance picks the most-overlapping eval doc, min id on ties") {
    val eval = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta one two"))
    val train = Seq(
      // shares 4 trigrams with eval 1, 2 with eval 2 -> best 1
      (10L, "alpha beta gamma delta epsilon zeta extra"),
      // equal overlap with both -> tie -> min eval id 1
      (11L, "alpha beta gamma delta"),
      // below minShared -> dropped
      (12L, "unrelated words entirely here"))
    val out = Decontaminate.provenance(
      train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"),
      "doc_id", "text", n = 3, minShared = 2L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) == 1L)
    assert(out(11L) == 1L)
    assert(!out.contains(12L))
  }
}
