package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** BM25 ranked retrieval over the corpus — the standard keyword-relevance
  * scorer a curation pipeline uses for quality retrieval and soft
  * decontamination (t13's shingle overlap is the hard-match form; BM25
  * finds the "about the same thing" docs that share vocabulary without
  * sharing n-grams). Lucene-form idf: ln((N − df + 0.5)/(df + 0.5) + 1),
  * per-term score idf · tf·(k1+1) / (tf + k1·((1−b) + b·dl/avgdl)).
  *
  * Engine-exact: every input to the floating-point chain (tf, df, dl, N,
  * total tokens T) is an exact integer, the op order is pinned and mirrored
  * token-for-token in the oracle SQL, and the final score is rounded (6dp)
  * to absorb cross-engine libm-ln ulp differences (the same discipline as
  * TfIdf). The per-doc sum over query terms folds in DECLARED term order
  * (one conditional sum per term, then a fixed left-to-right add) — a
  * `sum()` over a shuffled relation would be partition-order-dependent.
  *
  * Scale (100 TB): the `isin(queryTerms)` filter lands directly on the
  * exploded terms, so everything past the scan is proportional to docs
  * CONTAINING a query term, not the corpus; df/N/avgdl are tiny relations
  * broadcast by construction (≤ |query| + 1 rows); the final top-k is
  * `orderBy.limit` — Spark's TakeOrdered, a per-partition heap + k-row
  * merge, never a global sort. One exchange (the per-doc tf aggregation).
  */
object Bm25 {

  def search(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int, k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.distinct == queryTerms,
      s"queryTerms must be non-empty and distinct: $queryTerms")
    val base = df.select(col(idCol).as("id"),
      TextFns.tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).cast("long").as("dl"))
    val stats = base.agg(count(lit(1)).as("n"), sum(col("dl")).as("t"))
    val terms = base
      .select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
    val tf = terms.groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(stats))
    // exact-int inputs; op order pinned to the oracle's parenthesis tree
    val avgdl = col("t").cast("double") / col("n").cast("double")
    val idf = log((col("n").cast("double") - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)
    val denom = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl))
    val s = idf * ((col("tf").cast("double") * lit(k1 + 1.0)) / denom)
    val perTerm = scored.select(col("id"), col("term"), s.as("s"))
    // fixed-order fold over the declared query terms (each conditional sum
    // collapses at most one row, so the adds happen in ONE known order)
    val aggs = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("s"))).as(s"s$i")
    }
    val folded = perTerm.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val total = queryTerms.indices.map(i => coalesce(col(s"s$i"), lit(0.0)))
      .reduceLeft(_ + _)
    folded.select(col("id").as(idCol), round(total, 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(topK)
  }

  /** [[search]] oracle: the identical chain in DuckDB SQL. */
  def searchSql(table: String, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int, k1: Double = 1.2,
      b: Double = 0.75): String = {
    // SQL-escape interpolated terms (' -> ''): the DataFrame twin accepts
    // a quote in a term fine, so an unescaped oracle would silently
    // diverge (or inject) on exactly those inputs
    def q(t: String) = "'" + t.replace("'", "''") + "'"
    val inList = queryTerms.map(q).mkString(", ")
    val sums = queryTerms.zipWithIndex.map { case (t, i) =>
      s"SUM(CASE WHEN term = ${q(t)} THEN s END) AS s$i"
    }.mkString(",\n    ")
    val total = queryTerms.indices
      .map(i => s"COALESCE(s$i, 0.0)").reduceLeft((a, c) => s"($a + $c)")
    s"""WITH base AS (
       |  SELECT $idCol AS id, ${TextFns.tokensSql(textCol)} AS toks FROM $table),
       |withdl AS (SELECT id, toks, len(toks) AS dl FROM base),
       |stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS t FROM withdl),
       |terms AS (
       |  SELECT id, dl, unnest(toks) AS term FROM withdl),
       |tf AS (
       |  SELECT id, dl, term, COUNT(*) AS tf FROM terms
       |  WHERE term IN ($inList) GROUP BY 1, 2, 3),
       |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |perterm AS (
       |  SELECT id, tf.term,
       |    ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
       |       (CAST(df AS DOUBLE) + 0.5) + 1.0) *
       |    ((CAST(tf AS DOUBLE) * ${k1 + 1.0}) /
       |     (CAST(tf AS DOUBLE) + $k1 * (${1.0 - b} + $b *
       |       (CAST(dl AS DOUBLE) / (CAST(t AS DOUBLE) / CAST(n AS DOUBLE)))))) AS s
       |  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN stats),
       |folded AS (
       |  SELECT id,
       |    $sums
       |  FROM perterm GROUP BY id)
       |SELECT id AS $idCol, round($total, 6) AS score
       |FROM folded
       |ORDER BY score DESC, id ASC LIMIT $topK""".stripMargin
  }
}
