package graft

import org.apache.spark.sql.functions._

import graft.functions.{NameFns, TextFns, VectorFns}

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq(1).toDF("x").select(c).head()

  test("sanitizeName matches the reference sanitizer (div_link_handler.py:116-123)") {
    def s(in: String): String =
      Seq(in).toDF("v").select(NameFns.sanitizeName(col("v"))).head().getString(0)
    assert(s("  Apples (Golden) & Pears!  ") == "apples_golden_pears")
    assert(s("Beans - Fine") == "beans_-_fine")
    assert(s("A" * 150) == "a" * 100) // truncation at 100
    assert(s("Tab\tand  spaces") == "tab_and_spaces")
  }

  test("sanitizeName is idempotent") {
    val names = Seq("Crisp Apples!", "weird***name", "  x  y  z ").toDF("v")
    val once = names.select(NameFns.sanitizeName(col("v")).as("s"))
    val twice = once.select(NameFns.sanitizeName(col("s")).as("s"))
    assert(once.collect().toSeq == twice.collect().toSeq)
  }

  test("tokens/tokenCount handle empties and whitespace runs") {
    val df = Seq("", "   ", "one", " a  b\tc ").toDF("t")
    val counts = df.select(TextFns.tokenCount(col("t"))).collect().map(_.getLong(0)).toSeq
    assert(counts == Seq(0L, 0L, 1L, 3L))
  }

  test("bpeTokenCount splits letter runs, digit runs, and punctuation") {
    val df = Seq("abc123!x, y9").toDF("t")
    // abc|123|!|x|,|y|9 → 7
    assert(df.select(TextFns.bpeTokenCount(col("t"))).head().getLong(0) == 7L)
  }

  test("langId picks the dominant stopword language, 'und' when none") {
    val df = Seq(
      "the cat sat on the mat and it was good",
      "el perro y la casa de los gatos se fue",
      "zzz qqq www").toDF("t")
    val langs = df.select(TextFns.langId(col("t"))).collect().map(_.getString(0)).toSeq
    assert(langs == Seq("en", "es", "und"))
  }

  test("qualityScore is in [0,1] and favors clean prose") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and it was good for the farm",
      "!!!###$$$ %%% ^^^ &&&").toDF("t")
    val scores = df.select(TextFns.qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(1))
  }

  test("fingerprint is word-order-insensitive; contentHash is not") {
    val df = Seq(("a b c", "c b a")).toDF("x", "y")
    val r = df.select(
      TextFns.fingerprint(col("x")) === TextFns.fingerprint(col("y")),
      TextFns.contentHash(col("x")) === TextFns.contentHash(col("y"))).head()
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  test("redact replaces URLs and emails; rollingHash is order-sensitive") {
    val df = Seq("see https://x.io/a and a@b.co now").toDF("t")
    assert(df.select(TextFns.redact(col("t"))).head().getString(0) ==
      "see <url> and <email> now")
    assert(df.select(TextFns.redactionCount(col("t"))).head().getLong(0) == 2L)
    val hashes = Seq(("a b c", "c b a")).toDF("x", "y")
      .select(TextFns.rollingHash(col("x")), TextFns.rollingHash(col("y"))).head()
    assert(hashes.getLong(0) != hashes.getLong(1)) // order matters
  }

  test("shingles produce n-grams; short docs yield empty") {
    val df = Seq("a b c d", "a b").toDF("t")
    val sh = df.select(TextFns.shingles(col("t"), 3)).collect()
      .map(_.getSeq[String](0).toSeq).toSeq
    assert(sh == Seq(Seq("a b c", "b c d"), Seq.empty))
  }

  test("native dot expression is bit-equal to unrolled and dynamic forms") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val r = df.select(
      VectorFns.dot(col("a"), col("b"), 3),
      VectorFns.dotUnrolled(col("a"), col("b"), 3),
      VectorFns.dotDynamic(col("a"), col("b")),
      VectorFns.norm(col("a"), 3)).head()
    assert(r.getDouble(0) == 32.0 && r.getDouble(1) == 32.0 && r.getDouble(2) == 32.0)
    assert(math.abs(r.getDouble(3) - math.sqrt(14.0)) < 1e-12)
    // bit-equality on irrational accumulations, native vs unrolled
    val v = (1 to 64).map(i => (math.sqrt(i) / 3.0).toFloat).toArray
    val w = (1 to 64).map(i => (math.cos(i) * 1.7).toFloat).toArray
    val r2 = Seq((v, w)).toDF("a", "b").select(
      VectorFns.dot(col("a"), col("b"), 64),
      VectorFns.dotUnrolled(col("a"), col("b"), 64)).head()
    assert(java.lang.Double.doubleToLongBits(r2.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(r2.getDouble(1)))
  }

  test("lshPlanes are deterministic, mean-zero-ish halves") {
    val p1 = VectorFns.lshPlanes(4, 8)
    val p2 = VectorFns.lshPlanes(4, 8)
    assert(p1.map(_.toSeq).toSeq == p2.map(_.toSeq).toSeq)
    assert(p1.flatten.forall(w => w >= -7.5 && w <= 7.5 && (w * 2) == (w * 2).round))
  }

  test("repetition metrics: dupFrac/topFrac on known docs") {
    def metrics(text: String): (Long, Double, Double, Double) = {
      val r = Seq(text).toDF("text")
        .select(TextFns.tokens(col("text")).as("toks"),
          TextFns.shingles(col("text"), 3).as("tri3"))
        .select(size(col("toks")).cast("long"),
          TextFns.dupFrac(col("toks")), TextFns.dupFrac(col("tri3")),
          TextFns.topFrac(col("toks"))).head()
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    // all-unique: no dup tokens, top token holds 1/n
    assert(metrics("a b c d") == ((4L, 0.0, 0.0, 0.25)))
    // constant doc: all repeats, one trigram repeated 3x (of 4 total)
    val (n, dt, dg, tt) = metrics("x x x x x x")
    assert(n == 6L && dt == 1.0 - 1.0 / 6.0 && tt == 1.0)
    assert(dg == 1.0 - 1.0 / 4.0)
    // empty and whitespace-only are all-zero, not NaN
    assert(metrics("") == ((0L, 0.0, 0.0, 0.0)))
    assert(metrics("   ") == ((0L, 0.0, 0.0, 0.0)))
    // mixed: "the cat the dog" — 'the' twice of 4, all trigrams unique
    assert(metrics("the cat the dog") == ((4L, 0.25, 0.0, 0.5)))
  }

  test("normalizeUrl: case, default port, tracking params, fragment, param order") {
    import graft.functions.UrlFns
    def n(in: String): String =
      Seq(in).toDF("u").select(UrlFns.normalizeUrl(col("u"))).head().getString(0)
    // the messy-variant pair from t17 collapses to one canonical form
    assert(n("HTTPS://WWW.SRC0.COM:443/docs/7?utm_source=feed&ref=en&utm_campaign=c1#sec")
      == "https://www.src0.com/docs/7?ref=en")
    assert(n("https://www.src0.com/docs/7?ref=en") == "https://www.src0.com/docs/7?ref=en")
    // http default port; params sorted; gclid/fbclid stripped
    assert(n("HTTP://Host.Example:80/a?b=2&a=1&gclid=xyz") == "http://host.example/a?a=1&b=2")
    // non-default port survives; query-less URL gains nothing
    assert(n("https://h.example:8443/x") == "https://h.example:8443/x")
    // all params tracking -> '?' dropped entirely
    assert(n("https://h.example/p?utm_source=a&fbclid=b#f") == "https://h.example/p")
    // idempotent
    val messy = "HTTPS://A.B:443/p/q?utm_x=1&z=2&y=3#frag"
    assert(n(n(messy)) == n(messy))
  }

  test("domain strips www and port from the canonical url") {
    import graft.functions.UrlFns
    def d(in: String): String = Seq(in).toDF("u")
      .select(UrlFns.domain(UrlFns.normalizeUrl(col("u")))).head().getString(0)
    assert(d("https://WWW.News.Example.com/a/b") == "news.example.com")
    assert(d("https://api.example.com:8443/v1") == "api.example.com")
    assert(d("http://example.com") == "example.com")
  }
}
