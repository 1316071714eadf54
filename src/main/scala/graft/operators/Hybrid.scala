package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval via RECIPROCAL-RANK FUSION (RRF) — the standard way a
  * curation/RAG pipeline combines a lexical ranker (BM25, exact keyword
  * relevance) with a vector ranker (embedding cosine, semantic relevance):
  * each retriever contributes `1 / (kc + rank)` for every doc on its
  * top-`n` list, docs on both lists add both terms, and the fused top-k is
  * re-ranked by the summed score (Cormack et al.'s rank-only fusion — no
  * score calibration across retrievers is needed, which is exactly why it
  * is the production default).
  *
  * Engine-exact: both input RANKS are integers with pinned deterministic
  * tie-breaks (BM25 scores are 6dp-rounded then (score desc, id asc);
  * cosine ranks come from the exact left-associated double chain), the
  * fusion arithmetic is `1.0/(kc + rank)` on exact-integer ranks folded in
  * pinned order (lexical term + vector term), and the result is rounded to
  * 6dp — ties in the fused score (a lex-only rank r and a vec-only rank r
  * fuse to the same value) break on doc id in both engines.
  *
  * Scale (100 TB): fusion itself touches only the two top-`n` lists (≤ 2n
  * rows — driver-trivial); the heavy lifting stays inside the retrievers,
  * each with its own scale path (BM25's explode is pre-filtered to query
  * terms; the vector side swaps to IVF-PQ at corpus scale — same output
  * contract). The full-outer fuse join is a broadcast by construction.
  */
object Hybrid {

  /** Fused top-`topK` over `docs` (lexical BM25 on `textCol` for
    * `queryTerms`) and `embeddings` (cosine against the `queryVecId`
    * vector), each retriever contributing its top-`n` list. Doc ids and
    * vector ids share the key space (`docIdCol` ≡ `vecIdCol`).
    */
  def rrfSearch(docs: DataFrame, embeddings: DataFrame, docIdCol: String,
      textCol: String, vecIdCol: String, vecCol: String, dim: Int,
      queryTerms: Seq[String], queryVecId: Long, n: Int, topK: Int,
      rrfK: Int = 60): DataFrame = {
    require(n >= topK, s"per-list depth n ($n) must be >= topK ($topK)")
    // lexical list: BM25 already emits (id, score) ordered + limited to n;
    // the rank window runs over those n rows only (not the corpus)
    val wLex = Window.orderBy(col("score").desc, col(docIdCol).asc)
    val lex = Bm25.search(docs, docIdCol, textCol, queryTerms, topK = n)
      .withColumn("lex_rank", row_number().over(wLex).cast("long"))
      .select(col(docIdCol).as("lid"), col("lex_rank"))
    // vector list: exact cosine against the single query vector (the
    // corpus-scale swap-in is ivfPqTopK — same output contract)
    val vec = Similarity.cosineTopK(
        corpus = embeddings,
        queries = embeddings.filter(col(vecIdCol) === queryVecId),
        idCol = vecIdCol, vecCol = vecCol, dim = dim, k = n)
      .select(col("neighbor_id").as("vid"), col("rank").as("vec_rank"))
    val fused = lex.join(vec, col("lid") === col("vid"), "full_outer")
      .select(
        coalesce(col("lid"), col("vid")).as(docIdCol),
        col("lex_rank"), col("vec_rank"),
        round(
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("lex_rank").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK.toDouble) + col("vec_rank").cast("double")), lit(0.0)),
          6).as("rrf"))
    fused.orderBy(col("rrf").desc, col(docIdCol).asc).limit(topK)
  }

  /** [[rrfSearch]] oracle: the two retriever statements verbatim as
    * derived tables (DuckDB allows a WITH inside a subquery), the same
    * rank windows, the same pinned lex+vec fold, 6dp round.
    */
  def rrfSearchSql(docsTable: String, embTable: String, docIdCol: String,
      textCol: String, vecIdCol: String, vecCol: String, dim: Int,
      queryTerms: Seq[String], queryVecId: Long, n: Int, topK: Int,
      rrfK: Int = 60): String = {
    val lexSql = Bm25.searchSql(docsTable, docIdCol, textCol, queryTerms, topK = n)
    val vecSql = Similarity.cosineTopKSql(embTable, vecIdCol, vecCol, dim,
      k = n, queryPred = s"$vecIdCol = $queryVecId")
    s"""WITH lex AS (
       |  SELECT $docIdCol AS lid,
       |         ROW_NUMBER() OVER (ORDER BY score DESC, $docIdCol ASC) AS lex_rank
       |  FROM ($lexSql) bm),
       |vec AS (
       |  SELECT neighbor_id AS vid, rank AS vec_rank
       |  FROM ($vecSql) cs),
       |fused AS (
       |  SELECT COALESCE(lid, vid) AS $docIdCol, lex_rank, vec_rank,
       |    round(COALESCE(1.0 / ($rrfK.0 + CAST(lex_rank AS DOUBLE)), 0.0)
       |        + COALESCE(1.0 / ($rrfK.0 + CAST(vec_rank AS DOUBLE)), 0.0), 6) AS rrf
       |  FROM lex FULL OUTER JOIN vec ON lid = vid)
       |SELECT $docIdCol, lex_rank, vec_rank, rrf FROM fused
       |ORDER BY rrf DESC, $docIdCol ASC LIMIT $topK""".stripMargin
  }
}
