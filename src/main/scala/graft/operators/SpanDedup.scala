package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Exact substring-level deduplication: find (and optionally remove) exact
  * repeated token spans at ARBITRARY offsets across the corpus — the
  * within/cross-document repeated-passage remover that complements MinHash
  * (whole-document near-dup) and Chunker (fixed-width chunk stats; this
  * operator works at every offset, not chunk boundaries). The standard
  * companion pass of LLM training-data pipelines: boilerplate, licence
  * blocks, and quoted passages repeat verbatim inside otherwise-unique
  * documents.
  *
  * Formulation (sorted n-gram runs, the scalable stand-in for a suffix
  * array): slide a `width`-token window over every document; a window
  * whose gram occurs >= `minCount` times corpus-wide is "duplicated";
  * per document, maximal runs of duplicated windows whose token coverage
  * overlaps or touches (gap <= width) merge into one span
  * [span_start, span_end] (1-based token positions, inclusive).
  *
  * Scale notes (100 TB): every stage is linear in corpus token count — no
  * all-pairs form exists anywhere.
  * - the gram relation explodes to ~n_tokens rows, keyed by md5(gram) so
  *   the shuffle carries 32-byte keys, not width-token strings;
  * - corpus-wide gram frequency is one hash aggregation (map-side combine
  *   collapses hot boilerplate grams per partition before the exchange);
  * - the positions⋈duplicated-grams join hashes on the same key, so AQE
  *   reuses the aggregation's exchange;
  * - run-merging is one per-document sort (lag + running-sum windows share
  *   a single exchange on id, and the final (id, island) aggregation is
  *   satisfied by the id partitioning — no further shuffle).
  */
object SpanDedup {

  /** Maximal duplicated token spans per document.
    * Output: (idCol, span_start, span_end, n_grams) — 1-based inclusive
    * token positions and the count of duplicated width-grams merged into
    * the span.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String, width: Int,
      minCount: Long = 2): DataFrame = {
    require(width >= 2, s"width=$width: a 1-token span is a stopword filter")
    // shingling + per-gram md5 is expensive stage-1 work — spread an
    // underpartitioned local scan (util.Spread: no-op at scale)
    val g = graft.util.Spread(df).select(col(idCol).as("id"),
        posexplode(TextFns.shingles(col(textCol), width)).as(Seq("pos0", "gram")))
      .select(col("id"), (col("pos0") + 1).cast("long").as("pos"),
        md5(col("gram")).as("gh"))
    val dupg = g.groupBy(col("gh")).agg(count(lit(1)).as("_cnt"))
      .filter(col("_cnt") >= minCount)
      .select(col("gh"))
    val d = g.join(dupg, Seq("gh")).select(col("id"), col("pos"))
    // gaps-and-islands: a new island starts when the previous duplicated
    // gram's token coverage [prev, prev+width-1] neither overlaps nor
    // touches this one's (gap > width) — islands are exactly the maximal
    // contiguously-covered token runs
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    d.withColumn("prev", lag(col("pos"), 1).over(byDoc))
      .withColumn("island",
        sum(when(col("prev").isNull || col("pos") - col("prev") > width, 1)
          .otherwise(0)).over(byDoc))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (width - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"),
        col("n_grams"))
  }

  def dupSpansSql(table: String, idCol: String, textCol: String, width: Int,
      minCount: Long = 2): String = {
    val sh = TextFns.shinglesSql(textCol, width)
    s"""WITH docs AS (SELECT $idCol AS id, $sh AS l FROM $table),
       |g AS (
       |  SELECT id, i AS pos, md5(l[i]) AS gh
       |  FROM (SELECT id, l, unnest(range(1, len(l)+1)) AS i FROM docs)),
       |dupg AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= $minCount),
       |d AS (SELECT g.id, g.pos FROM g JOIN dupg ON g.gh = dupg.gh),
       |lagged AS (
       |  SELECT id, pos, LAG(pos) OVER (PARTITION BY id ORDER BY pos) AS prev
       |  FROM d),
       |isl AS (
       |  SELECT id, pos,
       |    SUM(CASE WHEN prev IS NULL OR pos - prev > $width THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY id ORDER BY pos) AS island
       |  FROM lagged)
       |SELECT id AS $idCol, MIN(pos) AS span_start,
       |  MAX(pos) + ${width - 1} AS span_end, CAST(COUNT(*) AS BIGINT) AS n_grams
       |FROM isl GROUP BY id, island""".stripMargin
  }

  /** The remover: documents with every duplicated span's tokens dropped
    * (ALL occurrences — the conservative policy; keep-first needs a global
    * occurrence order and is a downstream choice). Output: (idCol,
    * text_clean). Documents with no duplicated span pass through intact.
    */
  def stripDupSpans(df: DataFrame, idCol: String, textCol: String,
      width: Int, minCount: Long = 2): DataFrame = {
    val spans = dupSpans(df, idCol, textCol, width, minCount)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("_spans"))
    val emptySpans = array().cast(
      "array<struct<span_start:bigint,span_end:bigint>>")
    df.join(spans, Seq(idCol), "left")
      .select(col(idCol),
        array_join(
          filter(TextFns.tokens(col(textCol)), (_, i) =>
            !exists(coalesce(col("_spans"), emptySpans), sp =>
              (i + 1).cast("long").between(
                sp.getField("span_start"), sp.getField("span_end")))),
          " ").as("text_clean"))
  }
}
