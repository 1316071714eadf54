package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for the training-data pipeline extension
  * (BASELINE.json north_star): tokenization, token counting, language ID,
  * quality scoring, fingerprinting, shingling.
  *
  * Every function is built from codegen'd built-ins (no UDFs) so the hot
  * path stays inside whole-stage codegen at scale. Each Spark definition has
  * a `...Sql` twin emitting the equivalent DuckDB expression for the oracle;
  * the two must mirror the same operation tree so double arithmetic is
  * bit-identical across engines.
  */
object TextFns {

  // ---- tokenization ----------------------------------------------------

  /** Whitespace tokens; empty/blank text → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def tokensSql(col: String): String =
    s"CASE WHEN length(trim($col)) = 0 THEN [] ELSE regexp_split_to_array(trim($col), '\\s+') END"

  /** Whitespace token count (long, to match DuckDB len()). */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  def tokenCountSql(col: String): String = s"len(${tokensSql(col)})"

  /** BPE-ish subword-ish count: runs of letters, runs of digits, and single
    * other non-space chars each count as one token (ASCII classes only so
    * Java regex and RE2 agree).
    */
  private val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  def bpeTokenCount(c: Column): Column =
    regexp_count(c, lit(BpePattern)).cast("long")

  def bpeTokenCountSql(col: String): String =
    s"len(regexp_extract_all($col, '$BpePattern'))"

  // ---- language ID (n-gram/stopword heuristic) -------------------------

  /** Stopword tables per language, checked in declaration (priority) order. */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "se"),
    "fr" -> Seq("le", "les", "de", "et", "des", "un", "une", "du", "est", "dans"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "ein"),
  )

  /** Occurrence count (with multiplicity) of `words` among the tokens. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  def stopwordHitsSql(toksSql: String, words: Seq[String]): String = {
    val inList = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toksSql, t -> t IN ($inList)))"
  }

  /** Heuristic language ID: argmax of stopword hits, priority-ordered
    * tie-break, 'und' when no list matches at all.
    */
  def langId(c: Column): Column = {
    val toks = tokens(c)
    val scores = LangStopwords.map { case (lang, ws) => lang -> stopwordHits(toks, ws) }
    val total = scores.map(_._2).reduce(_ + _)
    // first language whose score >= every later language's score wins
    val chain = scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, sc), i), els) =>
        val later = scores.drop(i + 1).map(_._2)
        when(later.map(sc >= _).reduce(_ && _), lit(lang)).otherwise(els)
    }
    when(total === 0, lit("und")).otherwise(chain)
  }

  def langIdSql(col: String): String = {
    val toksSql = tokensSql(col)
    val scores = LangStopwords.map { case (lang, ws) => lang -> stopwordHitsSql(toksSql, ws) }
    val total = scores.map(_._2).mkString(" + ")
    val branches = scores.init.zipWithIndex.map { case ((lang, sc), i) =>
      val later = scores.drop(i + 1).map(_._2)
      val cond = later.map(l => s"$sc >= $l").mkString(" AND ")
      s"WHEN $cond THEN '$lang'"
    }
    s"CASE WHEN ($total) = 0 THEN 'und' ${branches.mkString(" ")} ELSE '${scores.last._1}' END"
  }

  // ---- quality score ---------------------------------------------------

  /** Heuristic document quality in [0,1]: mix of alpha ratio, low-punct,
    * stopword presence, and a length factor. The exact expression tree is
    * mirrored in `qualityScoreSql` — do not reorder terms.
    */
  def qualityScore(c: Column): Column = {
    val len = length(c).cast("double")
    val nAlpha = regexp_count(c, lit("[A-Za-z]")).cast("double")
    val nPunct = regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("double")
    val toks = tokens(c)
    val nTok = size(toks).cast("double")
    val nStop = stopwordHits(toks, LangStopwords.flatMap(_._2)).cast("double")
    val alphaRatio = when(len > 0, nAlpha / len).otherwise(lit(0.0))
    val punctRatio = when(len > 0, nPunct / len).otherwise(lit(0.0))
    val stopRatio = when(nTok > 0, nStop / nTok).otherwise(lit(0.0))
    val lenFactor = least(nTok / lit(100.0), lit(1.0))
    lit(0.4) * alphaRatio + lit(0.2) * (lit(1.0) - punctRatio) +
      lit(0.2) * stopRatio + lit(0.2) * lenFactor
  }

  def qualityScoreSql(col: String): String = {
    val toksSql = tokensSql(col)
    val allStops = LangStopwords.flatMap(_._2)
    val len = s"CAST(length($col) AS DOUBLE)"
    val nAlpha = s"CAST(len(regexp_extract_all($col, '[A-Za-z]')) AS DOUBLE)"
    val nPunct = s"CAST(len(regexp_extract_all($col, '[^A-Za-z0-9\\s]')) AS DOUBLE)"
    val nTok = s"CAST(len($toksSql) AS DOUBLE)"
    val nStop = s"CAST(${stopwordHitsSql(toksSql, allStops)} AS DOUBLE)"
    val alphaRatio = s"CASE WHEN $len > 0 THEN $nAlpha / $len ELSE 0.0 END"
    val punctRatio = s"CASE WHEN $len > 0 THEN $nPunct / $len ELSE 0.0 END"
    val stopRatio = s"CASE WHEN $nTok > 0 THEN $nStop / $nTok ELSE 0.0 END"
    val lenFactor = s"least($nTok / 100.0, 1.0)"
    s"0.4 * ($alphaRatio) + 0.2 * (1.0 - ($punctRatio)) + 0.2 * ($stopRatio) + 0.2 * ($lenFactor)"
  }

  // ---- fingerprinting --------------------------------------------------

  /** Content-defined fingerprint: md5 over the sorted distinct token set.
    * Word-order-insensitive, so re-orderings of the same vocabulary collide —
    * the cheap "same bag of words" near-dup detector.
    */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(c))), " "))

  def fingerprintSql(col: String): String =
    s"md5(array_to_string(list_sort(list_distinct(${tokensSql(col)})), ' '))"

  /** Exact content hash (whitespace-normalized). */
  def contentHash(c: Column): Column = md5(array_join(tokens(c), " "))

  def contentHashSql(col: String): String =
    s"md5(array_to_string(${tokensSql(col)}, ' '))"

  /** First 8 hex nibbles of md5 as a long in [0, 2^32) — the engine-portable
    * 32-bit hash. Spark converts the hex prefix directly; the SQL twin
    * mirrors it with nibble arithmetic (both are exact integer math, so the
    * values are identical). Also the simhash/KMV building block.
    */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  def md5Hash32Sql(s: String): String =
    (0 until 8).map { i =>
      s"(strpos('0123456789abcdef', substr(md5($s), ${i + 1}, 1)) - 1) * ${1L << (4 * (7 - i))}"
    }.mkString("(", " + ", ")")

  /** Rolling polynomial hash over the token sequence (Rabin–Karp shape):
    * h = fold(h * 31 + md5Hash32(token)) mod P. Order-sensitive (unlike
    * `fingerprint`), so re-orderings differ. Intermediate values stay below
    * 31 * P + 2^32 < 2^63, so the fold is exact in BIGINT in both engines.
    */
  private val RollP = 1000000007L

  def rollingHash(c: Column): Column =
    aggregate(tokens(c), lit(0L),
      (h, t) => pmod(h * 31 + md5Hash32(t), lit(RollP)))

  def rollingHashSql(col: String): String =
    s"""list_reduce(
       |  list_prepend(CAST(0 AS BIGINT),
       |    list_transform(${tokensSql(col)}, t -> ${md5Hash32Sql("t")})),
       |  (h, x) -> (h * 31 + x) % $RollP)""".stripMargin

  // ---- cleaning / redaction -------------------------------------------

  /** Training-data scrubbing: URLs and email-like tokens replaced with
    * placeholders (ASCII regexes so Java and RE2 agree).
    */
  private val UrlRe = "https?://[^\\s]+"
  private val EmailRe = "[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}"

  def redact(c: Column): Column =
    regexp_replace(regexp_replace(c, UrlRe, "<url>"), EmailRe, "<email>")

  def redactSql(col: String): String =
    s"regexp_replace(regexp_replace($col, '$UrlRe', '<url>', 'g'), '$EmailRe', '<email>', 'g')"

  def redactionCount(c: Column): Column =
    (regexp_count(c, lit(UrlRe)) + regexp_count(c, lit(EmailRe))).cast("long")

  def redactionCountSql(col: String): String =
    s"len(regexp_extract_all($col, '$UrlRe')) + len(regexp_extract_all($col, '$EmailRe'))"

  // ---- shingling -------------------------------------------------------

  /** Word n-gram shingles (space-joined); fewer than n tokens → empty.
    * Native one-pass expression — the composed transform/slice form
    * re-split the document per output element (see WordShingles).
    */
  def shingles(c: Column, n: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.plans.WordShingles(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), n))

  def shinglesSql(col: String, n: Int): String = {
    val t = tokensSql(col)
    s"CASE WHEN len($t) < $n THEN [] ELSE list_transform(range(1, len($t) - ${n - 2}), i -> array_to_string(($t)[i:i+${n - 1}], ' ')) END"
  }

  // ---- within-document repetition (Gopher-style quality signals) -------

  /** Fraction of element occurrences that are repeats of an earlier one:
    * 1 - distinct/total, 0.0 for an empty array. Integer counts + ONE
    * division keep the double bit-identical across engines.
    */
  def dupFrac(arr: Column): Column = {
    val n = size(arr).cast("double")
    when(n > 0, lit(1.0) - size(array_distinct(arr)).cast("double") / n)
      .otherwise(lit(0.0))
  }

  def dupFracSql(arrSql: String): String =
    s"CASE WHEN len($arrSql) > 0 THEN 1.0 - CAST(len(list_distinct($arrSql)) AS DOUBLE) / CAST(len($arrSql) AS DOUBLE) ELSE 0.0 END"

  /** Fraction of occurrences claimed by the single most frequent element
    * (1/n for all-unique, 1.0 for constant; 0.0 for empty). O(d·n) HOF per
    * row over the distinct set — fine for documents (d ≲ vocab), and the
    * caller stages `arr` in a projection so it is computed once (Catalyst
    * does not inline non-cheap multiply-referenced aliases).
    */
  def topFrac(arr: Column): Column = {
    val n = size(arr).cast("double")
    val maxCnt = array_max(transform(array_distinct(arr),
      x => size(filter(arr, y => y === x))))
    when(n > 0, maxCnt.cast("double") / n).otherwise(lit(0.0))
  }

  def topFracSql(arrSql: String): String =
    s"CASE WHEN len($arrSql) > 0 THEN CAST(list_max(list_transform(list_distinct($arrSql), x -> len(list_filter($arrSql, y -> y = x)))) AS DOUBLE) / CAST(len($arrSql) AS DOUBLE) ELSE 0.0 END"

  // ---- composite quality-rule gate (Gopher-style) ----------------------

  /** Exact total character count of the tokens (BIGINT fold; 0 for a null
    * array, matching the SQL twin's coalesce).
    */
  def sumTokenLen(toks: Column): Column =
    coalesce(aggregate(toks, lit(0L), (a, t) => a + length(t)), lit(0L))

  def sumTokenLenSql(toksSql: String): String =
    s"CAST(coalesce(list_sum(list_transform($toksSql, t -> len(t))), 0) AS BIGINT)"

  /** Occurrences of the single most frequent token (0 for empty). */
  def topTokenCount(toks: Column): Column =
    coalesce(array_max(transform(array_distinct(toks),
      x => size(filter(toks, y => y === x)))), lit(0)).cast("long")

  def topTokenCountSql(toksSql: String): String =
    s"CAST(coalesce(list_max(list_transform(list_distinct($toksSql), x -> len(list_filter($toksSql, y -> y = x)))), 0) AS BIGINT)"
}
