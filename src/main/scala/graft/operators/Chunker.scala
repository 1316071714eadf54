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

  /** Content-DEFINED chunking (CDC, the Rabin-fingerprint boundary rule at
    * token granularity): a chunk boundary falls after token i exactly when
    * the rolling hash of the last `window` tokens ≡ 0 (mod `divisor`) — so
    * boundaries are a function of local CONTENT, not of position. That is
    * the property fixed-width chunking (d09) lacks: insert one sentence
    * ahead of a shared licence block and every later fixed chunk shifts
    * and stops matching, while CDC boundaries re-align within `window`
    * tokens and the shared tail still dedups. Average chunk length ≈
    * `divisor` tokens.
    *
    * Output: per document, chunk counts plus how many chunks (and tokens)
    * are shared with other documents.
    *
    * Scale notes (100 TB): boundary detection is a narrow higher-order
    * projection, O(n·window) integer ops per document, zero shuffle; the
    * chunk relation is ~n_tokens/divisor rows per doc (constant factor);
    * the frequency agg and the chunk→frequency join hash on the same
    * chunk-hash key (exchange reused), and the final rollup shuffles doc
    * ids with counts only — the d09 plan shape, with content-defined
    * spans. This is also the storage-dedup primitive: the same boundary
    * rule over byte streams gives variable-size block dedup.
    */
  def cdcDupStats(df: DataFrame, idCol: String, textCol: String,
      window: Int = 4, divisor: Int = 8): DataFrame = {
    val P = 1000000007L
    def poly(arr: org.apache.spark.sql.Column) =
      aggregate(arr, lit(0L), (h, x) => pmod(h * 31 + x, lit(P)))
    // per-token md5 + rolling polynomial hashing is expensive stage-1 work
    // — spread an underpartitioned local scan (util.Spread: no-op at scale)
    val spans = graft.util.Spread(df)
      .select(col(idCol).as("id"), TextFns.tokens(col(textCol)).as("tk"))
      .withColumn("hs", transform(col("tk"), t => TextFns.md5Hash32(t)))
      .withColumn("n", size(col("tk")))
      .withColumn("bpos",
        when(col("n") >= window,
          filter(sequence(lit(window), col("n")), i =>
            pmod(poly(slice(col("hs"), i - (window - 1), lit(window))),
              lit(divisor.toLong)) === 0))
          .otherwise(array().cast("array<int>")))
      .withColumn("ss", concat(array(lit(1)), transform(col("bpos"), _ + 1)))
      .withColumn("es", concat(col("bpos"), array(col("n"))))
      .select(col("id"), col("hs"),
        explode(filter(
          transform(sequence(lit(1), size(col("ss"))), j =>
            struct(element_at(col("ss"), j).as("s"),
              element_at(col("es"), j).as("e"))),
          c => c.getField("s") <= c.getField("e"))).as("sp"))
      .select(col("id"),
        (col("sp.e") - col("sp.s") + 1).cast("long").as("n_toks"),
        poly(slice(col("hs"), col("sp.s"), col("sp.e") - col("sp.s") + 1))
          .as("chash"))
    val freq = spans.groupBy(col("chash"))
      .agg(countDistinct(col("id")).as("docs_with"))
    spans.join(freq, Seq("chash"))
      .groupBy(col("id").as(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum((col("docs_with") > 1).cast("long")).as("n_shared_chunks"),
        sum(when(col("docs_with") > 1, col("n_toks")).otherwise(0L))
          .as("n_shared_tokens"))
      .withColumn("dup_chunk_frac",
        col("n_shared_chunks").cast("double") / col("n_chunks").cast("double"))
  }

  /** DuckDB mirror of `cdcDupStats` over `table`. */
  def cdcDupStatsSql(table: String, idCol: String, textCol: String,
      window: Int = 4, divisor: Int = 8): String = {
    val toks = TextFns.tokensSql(textCol)
    val w1 = window - 1
    val poly = s"(h, x) -> (h * 31 + x) % 1000000007"
    s"""WITH docs AS (SELECT $idCol AS id, $toks AS tk FROM $table),
       |hashed AS (
       |  SELECT id, list_transform(tk, t -> ${TextFns.md5Hash32Sql("t")}) AS hs,
       |    len(tk) AS n
       |  FROM docs),
       |bp AS (
       |  SELECT id, hs, n,
       |    list_filter(range($window, n + 1), i ->
       |      list_reduce(list_prepend(CAST(0 AS BIGINT), hs[i - $w1:i]), $poly)
       |        % $divisor = 0) AS bpos
       |  FROM hashed),
       |sp AS (
       |  SELECT id, hs,
       |    list_prepend(1, list_transform(bpos, i -> i + 1)) AS ss,
       |    list_append(bpos, n) AS es
       |  FROM bp),
       |ix AS (
       |  SELECT id, hs, ss, es, unnest(range(1, len(ss) + 1)) AS j FROM sp),
       |spans AS (
       |  SELECT id, CAST(es[j] - ss[j] + 1 AS BIGINT) AS n_toks,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), hs[ss[j]:es[j]]), $poly)
       |      AS chash
       |  FROM ix WHERE ss[j] <= es[j]),
       |freq AS (SELECT chash, COUNT(DISTINCT id) AS docs_with FROM spans GROUP BY 1)
       |SELECT spans.id AS $idCol, COUNT(*) AS n_chunks,
       |  CAST(SUM(CASE WHEN docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_shared_chunks,
       |  CAST(SUM(CASE WHEN docs_with > 1 THEN n_toks ELSE 0 END) AS BIGINT)
       |    AS n_shared_tokens,
       |  CAST(SUM(CASE WHEN docs_with > 1 THEN 1 ELSE 0 END) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) AS dup_chunk_frac
       |FROM spans JOIN freq USING (chash)
       |GROUP BY 1""".stripMargin
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
