package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Chunk-level (paragraph-analog) deduplication: split each document into
  * fixed-width word chunks, fingerprint each chunk, and measure what share
  * of a document's chunks also appear in OTHER documents. This is the
  * boilerplate-removal primitive of a training-data pipeline — repeated
  * headers/footers/licence blocks show up as high cross-doc chunk
  * frequency even when whole-document hashes are unique.
  *
  * Scale notes (100 TB):
  * - Chunks are disjoint (not sliding), so the exploded relation is
  *   ~n_tokens/width rows per document — a constant factor of the corpus,
  *   not a quadratic blowup.
  * - The chunk-frequency aggregation and the chunk→frequency join both hash
  *   on `ch`, so the exchange introduced by the aggregation is reused by
  *   the join (one shuffle of the chunk relation, map-side combined).
  * - The final per-document rollup shuffles on the doc id (counts only).
  */
object Chunker {

  /** Exploded (id, chunk_idx, ch) relation: md5 fingerprint per
    * `width`-word chunk. Documents shorter than one token produce no rows
    * (same as unnest of an empty list in the oracle).
    */
  def chunks(df: DataFrame, idCol: String, textCol: String,
      width: Int): DataFrame = {
    val nChunks = floor((size(col("toks")) + width - 1) / width).cast("int")
    df.select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("toks"))
      .withColumn("idx", explode(
        when(col("toks").isNotNull && size(col("toks")) > 0,
          sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))))
      .select(col("id"), col("idx").cast("long").as("chunk_idx"),
        md5(array_join(slice(col("toks"), col("idx") * width + 1, lit(width)), " "))
          .as("ch"))
  }

  /** Per-document cross-doc duplication stats at chunk granularity:
    * n_chunks, n_shared_chunks (chunks whose fingerprint occurs in >1
    * distinct document), and their ratio (one exact-int division, so the
    * double is engine-stable).
    */
  def dupChunkStats(df: DataFrame, idCol: String, textCol: String,
      width: Int): DataFrame = {
    val ch = chunks(df, idCol, textCol, width)
    val freq = ch.groupBy(col("ch"))
      .agg(countDistinct(col("id")).as("docs_with"))
    ch.join(freq, Seq("ch"))
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum((col("docs_with") > 1).cast("long")).as("n_shared_chunks"))
      .withColumn("dup_chunk_frac",
        col("n_shared_chunks").cast("double") / col("n_chunks").cast("double"))
  }

  /** Boilerplate REMOVER built on the d09 signal: rebuild each document
    * keeping only the chunks whose fingerprint occurs in at most `maxDocs`
    * distinct documents — repeated headers/footers/licence blocks (high
    * cross-doc chunk frequency) are stripped; unique prose survives. The
    * C4-style cleaning rule at chunk granularity. Output: (id, n_chunks,
    * n_kept, clean_text) with `clean_text` the kept chunks re-joined in
    * chunk order (token-normalized text — single-space joined, like every
    * downstream tokenizer sees it anyway).
    *
    * Scale notes: same two chunk-keyed shuffles as `dupChunkStats` (agg +
    * join on `ch`, exchange reused) plus one doc-keyed rollup. The per-doc
    * collect_list buffers one document's own chunks — bounded by document
    * length, the same bound as holding the document's text column itself.
    */
  def stripSharedChunks(df: DataFrame, idCol: String, textCol: String,
      width: Int, maxDocs: Int): DataFrame = {
    val nChunks = floor((size(col("toks")) + width - 1) / width).cast("int")
    val ch = df.select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("toks"))
      .withColumn("idx", explode(
        when(col("toks").isNotNull && size(col("toks")) > 0,
          sequence(lit(0), nChunks - 1))
          .otherwise(array().cast("array<int>"))))
      .select(col("id"), col("idx"),
        array_join(slice(col("toks"), col("idx") * width + 1, lit(width)), " ")
          .as("chunk_txt"))
      .withColumn("ch", md5(col("chunk_txt")))
    val freq = ch.groupBy(col("ch"))
      .agg(countDistinct(col("id")).as("docs_with"))
    ch.join(freq, Seq("ch"))
      .withColumn("keep", col("docs_with") <= maxDocs)
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("keep").cast("long")).as("n_kept"),
        array_join(
          transform(
            filter(
              sort_array(collect_list(struct(col("idx"), col("keep"), col("chunk_txt")))),
              s => s.getField("keep")),
            s => s.getField("chunk_txt")),
          " ").as("clean_text"))
  }

  /** DuckDB mirror of `stripSharedChunks` over `table`. */
  def stripSharedChunksSql(table: String, idCol: String, textCol: String,
      width: Int, maxDocs: Int): String = {
    val toks = TextFns.tokensSql(textCol)
    s"""WITH docs AS (SELECT $idCol AS id, $toks AS toks FROM $table),
       |exploded AS (
       |  SELECT id, toks, unnest(range(0, (len(toks) + ${width - 1}) // $width)) AS i
       |  FROM docs),
       |chunked AS (
       |  SELECT id, i,
       |    array_to_string(toks[(i * $width + 1):(i * $width + $width)], ' ') AS chunk_txt
       |  FROM exploded),
       |withf AS (
       |  SELECT id, i, chunk_txt, md5(chunk_txt) AS ch FROM chunked),
       |freq AS (SELECT ch, COUNT(DISTINCT id) AS docs_with FROM withf GROUP BY 1)
       |SELECT w.id AS $idCol, COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN f.docs_with <= $maxDocs THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  COALESCE(string_agg(chunk_txt, ' ' ORDER BY w.i)
       |    FILTER (WHERE f.docs_with <= $maxDocs), '') AS clean_text
       |FROM withf w JOIN freq f ON w.ch = f.ch
       |GROUP BY 1""".stripMargin
  }

  /** RAG-prep sliding chunks: token windows of `width` starting every
    * `stride` tokens (stride < width ⇒ overlapping context windows, the
    * retrieval-index shape; stride == width degenerates to `chunks`).
    * Emits (id, chunk_idx, start_tok, chunk_len, chunk_hash, chunk_text).
    * One narrow posexplode of ceil(n/stride) starts per document —
    * relation size is corpus_tokens/stride rows, a constant factor, never
    * quadratic. Tail chunks shorter than `width` are kept (clamped slice),
    * so every token is covered by at least one chunk.
    */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(stride >= 1 && width >= stride,
      s"need 1 <= stride <= width, got width=$width stride=$stride")
    df.select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("id"), col("toks"),
        posexplode(sequence(lit(0), col("n") - 1, lit(stride))))
      .withColumn("chunk", slice(col("toks"), col("col") + 1, lit(width)))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start_tok"),
        size(col("chunk")).cast("long").as("chunk_len"),
        md5(array_join(col("chunk"), " ")).as("chunk_hash"))
  }

  /** DuckDB mirror of `slidingChunks` over `table`. */
  def slidingChunksSql(table: String, idCol: String, textCol: String,
      width: Int, stride: Int): String = {
    val toks = TextFns.tokensSql(textCol)
    s"""WITH docs AS (
       |  SELECT $idCol AS id, $toks AS toks FROM $table),
       |st AS (
       |  SELECT id, toks,
       |    unnest(generate_series(0, len(toks) - 1, $stride)) AS start_tok
       |  FROM docs WHERE len(toks) > 0),
       |ch AS (
       |  SELECT id, start_tok // $stride AS chunk_idx, start_tok,
       |    toks[(start_tok + 1):(start_tok + $width)] AS chunk
       |  FROM st)
       |SELECT id, chunk_idx, start_tok,
       |  CAST(len(chunk) AS BIGINT) AS chunk_len,
       |  md5(array_to_string(chunk, ' ')) AS chunk_hash
       |FROM ch""".stripMargin
  }

  def dupChunkStatsSql(table: String, idCol: String, textCol: String,
      width: Int): String = {
    val toks = TextFns.tokensSql(textCol)
    s"""WITH docs AS (SELECT $idCol AS id, $toks AS toks FROM $table),
       |exploded AS (
       |  SELECT id, toks, unnest(range(0, (len(toks) + ${width - 1}) // $width)) AS i
       |  FROM docs),
       |chunked AS (
       |  SELECT id, i,
       |    md5(array_to_string(toks[(i * $width + 1):(i * $width + $width)], ' ')) AS ch
       |  FROM exploded),
       |freq AS (SELECT ch, COUNT(DISTINCT id) AS docs_with FROM chunked GROUP BY 1)
       |SELECT chunked.id AS $idCol, COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_chunks,
       |  CAST(SUM(CASE WHEN docs_with > 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_chunk_frac
       |FROM chunked JOIN freq ON chunked.ch = freq.ch
       |GROUP BY 1""".stripMargin
  }
}
