package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{NameFns, TextFns}

/** Property-based invariants (SURVEY.md §5.2) using ScalaCheck generators
  * with fixed seeds (deterministic; the scalatest-plus bridge is not in the
  * offline cache). Checks run through the real column functions on a
  * DataFrame so the exercised code path is the engine's.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def evalStr(in: Seq[String], c: org.apache.spark.sql.Column): Seq[String] =
    in.toDF("v").select(c.cast("string")).collect()
      .map(r => Option(r.getString(0)).getOrElse("")).toSeq

  test("sanitizeName output is within charset [a-z0-9_-], <= 100 chars, idempotent") {
    val raw = samples(Gen.asciiPrintableStr.map(_.take(150)), 60)
    assert(raw.nonEmpty)
    val once = evalStr(raw, NameFns.sanitizeName(col("v")))
    assert(once.forall(s => s.length <= 100 && s.matches("[a-z0-9_\\-]*")))
    val twice = evalStr(once, NameFns.sanitizeName(col("v")))
    assert(twice == once)
  }

  test("shingle count equals max(0, tokens - n + 1)") {
    val words = Gen.listOf(Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8)))
    val texts = samples(words, 40).map(_.mkString(" "))
    val rows = texts.toDF("v")
      .select(TextFns.tokenCount(col("v")),
        size(TextFns.shingles(col("v"), 3)).cast("long")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == math.max(0L, r.getLong(0) - 2))
    }
  }

  test("native WordShingles is bit-identical to the composed built-in form (edge whitespace included)") {
    // the old expression this replaced — still the semantic definition and
    // the shape mirrored by TextFns.shinglesSql in DuckDB
    def composed(c: org.apache.spark.sql.Column, n: Int) = {
      val toks = TextFns.tokens(c)
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(
          sequence(lit(1), size(toks) - (n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))
    }
    val edge = Seq("", " ", "\t", "a", "a b", "a b c", "a  b   c d",
      "\tleading tab stays after space-trim x y", "trailing tab\t a b",
      "a\nb\nc d", "  spaces  around  words  ", "one nbsp word here")
    val rand = samples(Gen.listOf(Gen.oneOf(
      Gen.alphaLowerStr.map(_.take(6)), Gen.const(" "), Gen.const("\t"),
      Gen.const("\n"))), 50).map(_.mkString(" "))
    val rows = (edge ++ rand).toDF("v")
      .select(TextFns.shingles(col("v"), 3).as("native"),
        composed(col("v"), 3).as("old"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"mismatch native=${r.getSeq[String](0)} old=${r.getSeq[String](1)}")
    }
  }

  test("jaccard pairs are ordered (id_a < id_b) and bounded in (0,1]") {
    val docs = Seq(
      (0L, "a b c d e f"), (1L, "a b c d e g"), (2L, "a b c d e f"),
      (3L, "x y z w v u")).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 2, 0.0)
      .collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall { r =>
      val j = r.getAs[Double]("jaccard"); j > 0.0 && j <= 1.0
    })
    // identical docs have jaccard exactly 1
    val identical = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 2L).get
    assert(identical.getAs[Double]("jaccard") == 1.0)
  }

  test("SortedIntersectCount equals array_intersect size on arbitrary token sets") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // random word-sets (including empty and disjoint); both representations
    // built from the same column so any mismatch is the merge's fault
    val word = Gen.oneOf("a", "b", "c", "dd", "ee", "ff", "ggg", "hh", "i", "jj")
    val set = Gen.listOfN(12, word).map(_.distinct)
    val pairs = samples(Gen.zip(set, set), 80)
    val df = pairs.map { case (x, y) => (x, y) }.toDF("xs", "ys")
    def ks(c: org.apache.spark.sql.Column) =
      sort_array(transform(c, s => struct(xxhash64(s).as("k"), s.as("s"))))
    val merged = ColumnBridge.column(graft.plans.SortedIntersectCount(
      ColumnBridge.expression(ks(col("xs"))),
      ColumnBridge.expression(ks(col("ys")))))
    val rows = df.select(merged.as("m"),
      size(array_intersect(col("xs"), col("ys"))).as("h")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("dupSpans invariants on random small-vocab corpora") {
    // tiny vocab forces plenty of genuine repeated grams
    val word = Gen.oneOf("ga", "bu", "zo", "meu")
    val doc = Gen.listOfN(14, word).map(_.mkString(" "))
    val width = 3
    val corpus = samples(doc, 40).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = corpus.toDF("doc_id", "text")
    val spans = graft.operators.SpanDedup.dupSpans(df, "doc_id", "text", width)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nTok = corpus.map { case (id, t) => id -> t.split("\\s+").length }.toMap
    // structural invariants: bounds inside the doc, spans at least one gram
    // wide, per-doc spans disjoint and separated by > width - 1 tokens
    // (else they'd have merged), n_grams consistent with the span extent
    for ((id, s, e, ng) <- spans) {
      assert(s >= 1 && e <= nTok(id) && s + width - 1 <= e, ((id, s, e)))
      assert(ng >= 1 && ng <= e - width + 1 - s + 1, ((id, s, e, ng)))
    }
    for ((_, ds) <- spans.groupBy(_._1); Array(a, b) <- ds.sortBy(_._2).sliding(2)) {
      assert(b._2 > a._3 + 1, s"adjacent spans would have merged: $a $b")
    }
    // every gram inside a span region that the gram relation marks occurs
    // >= 2 times corpus-wide; verified directly against a brute-force count
    val gramCounts = corpus.flatMap { case (_, t) =>
      t.split("\\s+").sliding(width).map(_.mkString(" "))
    }.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val spanSet = spans.groupBy(_._1)
    for ((id, t) <- corpus) {
      val toks = t.split("\\s+")
      val marked = toks.sliding(width).zipWithIndex.filter {
        case (g, i0) => gramCounts(g.mkString(" ")) >= 2
      }.map(_._2 + 1).toSeq
      // brute-force islands must equal the engine's spans for this doc
      // merge iff this gram starts within `width` of the island's last
      // gram start (last start = end - width + 1), i.e. p <= end + 1
      val expected = marked.foldLeft(List.empty[(Long, Long)]) {
        case (acc, p) if acc.nonEmpty && p <= acc.head._2 + 1 =>
          (acc.head._1, math.max(acc.head._2, p + width - 1).toLong) :: acc.tail
        case (acc, p) => (p.toLong, (p + width - 1).toLong) :: acc
      }.reverse
      val got = spanSet.getOrElse(id, Array.empty).sortBy(_._2)
        .map(x => (x._2, x._3)).toList
      assert(got == expected, s"doc $id: $got vs $expected")
    }
  }

  test("PrefixSum equals the naive window on random keys/values/buckets") {
    val keyGen = Gen.chooseNum(-100000L, 100000L)
    for (trial <- 0 until 3) {
      val keys = samples(keyGen, 300 + trial * 57).distinct
      val rows = keys.map(k => (k, (k % 13) - 6, k % 7))
      val df = rows.toDF("k", "a", "b").repartition(7)
      val nb = Seq(1, 5, 300)(trial)
      val got = graft.operators.PrefixSum
        .runningSums(df, "k", Seq("a", "b"), numBuckets = nb)
        .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      var (ca, cb) = (0L, 0L)
      val expect = rows.sortBy(_._1).map { case (k, a, b) =>
        ca += a; cb += b; (k, ca, cb) }
      assert(got == expect, s"trial $trial (buckets=$nb)")
    }
  }

  test("DsirScoreConst is additive under document concatenation") {
    // score(doc1 ++ doc2) == score(doc1) + score(doc2): the per-token sum
    // has no cross-token state, so chunked and whole scoring agree — the
    // property that makes sharded/streamed scoring safe
    val word = Gen.oneOf("alpha", "beta", "gamma", "noise", "junk", "zz9")
    val half = Gen.listOfN(9, word).map(_.mkString(" "))
    val docs = samples(Gen.zip(half, half), 25).zipWithIndex
      .map { case ((h1, h2), i) => (i.toLong, h1, h2) }
    val df = docs.toDF("id", "h1", "h2")
    val w = (0L until 32L).map(b => b ->
      java.math.BigDecimal.valueOf((b * 137 % 997) - 450, 6)).toMap
    val micro = new Array[Long](32)
    w.foreach { case (k, v) => micro(k.toInt) = v.movePointRight(6).longValueExact() }
    def score(c: org.apache.spark.sql.Column) =
      graft.plans.DsirScoreConst(TextFns.tokens(c), micro, 32)
    val rows = df.select(score(col("h1")) + score(col("h2")),
      score(concat_ws(" ", col("h1"), col("h2")))).collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }
}
