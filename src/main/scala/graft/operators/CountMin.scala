package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** CountMin sketch: a fixed-size (depth × width) mergeable frequency summary.
  *
  * Complements the SpaceSaving heavy-hitters aggregator (t18): SpaceSaving
  * answers "which items are frequent", CountMin answers "how frequent is
  * THIS item" for arbitrary later probes, from a summary whose size is
  * independent of both corpus and vocabulary size. Estimates never
  * undercount: est(x) = min over rows of cell(h_j(x)) >= true(x), with the
  * classic (e/width)-overcount bound.
  *
  * Engine-portable hashing: row j's hash of token t is `md5Hash32("j:" || t)
  * mod width` — exact integer arithmetic both engines replay identically
  * (TextFns.md5Hash32 / md5Hash32Sql), so the sketch and its estimates are
  * oracle-exact, not merely approximately-equal.
  *
  * Scale notes (100 TB): the sketch relation is at most depth×width rows
  * AFTER one hash aggregation with map-side partial combine — each task
  * emits ≤ depth×width partial cells no matter how many tokens it scans, so
  * the exchange is O(partitions × depth × width), corpus-size-independent.
  * `merge` is cellwise addition (union + re-sum of two tiny relations):
  * per-day / per-source sketches combine without touching raw data — the
  * incremental-ingest shape. Probing broadcasts the ≤ depth×width sketch.
  */
object CountMin {

  /** Row-j bucket of a token column: md5Hash32("j:" || tok) mod width. */
  def bucket(j: Int, tok: Column, width: Int): Column =
    pmod(TextFns.md5Hash32(concat(lit(s"$j:"), tok)), lit(width.toLong))

  private def bucketSql(j: Int, tokExpr: String, width: Int): String =
    s"(${TextFns.md5Hash32Sql(s"'$j:' || $tokExpr")} % $width)"

  /** One (seed, bucket) struct per sketch row for a token column. */
  private def cells(tok: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(j =>
      struct(lit(j).as("seed"), bucket(j, tok, width).as("bucket"))): _*)

  /** Build the sketch relation (seed, bucket, cnt) from a token column of
    * `df`. One narrow explode (depth structs per token) + one aggregation.
    */
  def sketch(df: DataFrame, tokCol: String, depth: Int, width: Int): DataFrame =
    // depth engine-portable md5 hashes per token is expensive stage-1 work
    // — spread an underpartitioned local scan so it runs parallel
    // (util.Spread: no-op at scale, where the source arrives split)
    graft.util.Spread(df)
      .select(explode(cells(col(tokCol), depth, width)).as("c"))
      .groupBy(col("c.seed").as("seed"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Cellwise merge of two sketches built with the same (depth, width). */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("seed"), col("bucket"))
      .agg(sum(col("cnt")).cast("long").as("cnt"))

  /** Point-estimate each probe token against a sketch: min over the depth
    * rows of the addressed cell (0 when a cell was never touched). The
    * sketch side is bounded by depth×width rows — broadcast it.
    */
  def estimate(sk: DataFrame, probes: DataFrame, tokCol: String,
      depth: Int, width: Int): DataFrame = {
    val addressed = probes
      .withColumn("c", explode(cells(col(tokCol), depth, width)))
      .select(probes.columns.map(col) :+ col("c.seed").as("seed") :+
        col("c.bucket").as("bucket"): _*)
    addressed
      .join(broadcast(sk), Seq("seed", "bucket"), "left")
      .groupBy(probes.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** DuckDB mirror of `sketch` over a one-column relation `toksRel(tok)`:
    * a CTE body producing (seed, bucket, cnt).
    */
  def sketchSql(toksRel: String, depth: Int, width: Int): String =
    (0 until depth)
      .map(j => s"SELECT $j AS seed, ${bucketSql(j, "tok", width)} AS bucket " +
        s"FROM $toksRel")
      .mkString("SELECT seed, bucket, COUNT(*) AS cnt FROM (",
        " UNION ALL ", ") GROUP BY 1, 2")

  /** DuckDB mirror of `estimate` over `probesRel(tok, ...)` against
    * `sketchRel(seed, bucket, cnt)`: body producing (tok, cms_est).
    */
  def estimateSql(probesRel: String, sketchRel: String,
      depth: Int, width: Int): String = {
    val addressed = (0 until depth)
      .map(j => s"SELECT tok, $j AS seed, ${bucketSql(j, "tok", width)} AS bucket " +
        s"FROM $probesRel")
      .mkString(" UNION ALL ")
    s"""SELECT a.tok, MIN(COALESCE(s.cnt, 0)) AS cms_est
       |FROM ($addressed) a
       |LEFT JOIN $sketchRel s ON a.seed = s.seed AND a.bucket = s.bucket
       |GROUP BY a.tok""".stripMargin
  }

  /** JOIN-SIZE estimation from two sketches — the query-optimizer
    * cardinality primitive: |A ⋈_k B| = Σ_k fA(k)·fB(k), estimated as the
    * MIN over the depth rows of the per-row inner product
    * Σ_b cmA[j][b]·cmB[j][b]. Hash collisions only ADD cross terms, so
    * like point estimates this never undercounts; two depth×width
    * summaries answer the question without touching either table again.
    */
  def joinSizeEstimate(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("seed"), col("bucket"), col("cnt").as("cnt_a"))
      .join(b.select(col("seed"), col("bucket"), col("cnt").as("cnt_b")),
        Seq("seed", "bucket"))
      .groupBy(col("seed"))
      .agg(sum(col("cnt_a") * col("cnt_b")).cast("long").as("ip"))
      .agg(min(col("ip")).as("est_join_size"))

  /** DuckDB mirror of [[joinSizeEstimate]] over two sketch relations:
    * scalar body producing (est_join_size).
    */
  def joinSizeEstimateSql(sketchA: String, sketchB: String): String =
    s"""SELECT MIN(ip) AS est_join_size FROM (
       |  SELECT a.seed, CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS ip
       |  FROM $sketchA a JOIN $sketchB b
       |    ON a.seed = b.seed AND a.bucket = b.bucket
       |  GROUP BY 1)""".stripMargin
}
