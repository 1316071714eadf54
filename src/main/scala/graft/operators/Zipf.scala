package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Zipf-fit vocabulary diagnostic: per source, the OLS slope/intercept of
  * ln(freq) on ln(rank) over the top-`topR` terms — the standard corpus-
  * health check (natural language tracks slope ≈ −1; template/boilerplate
  * sources run much steeper, spammy concatenations much flatter), run per
  * source so one bad feed stands out in a 20-source mixture.
  *
  * Engine-exact: term frequencies and ranks are exact integers with pinned
  * tie-breaks (freq desc, term asc); both log values are rounded to 6dp
  * and cast to DECIMAL(18,6), so the normal-equation sums are EXACT decimal
  * arithmetic (partition-order-independent — a raw double sum would hash-
  * differ run to run); the closed-form slope/intercept then evaluates one
  * identical double expression tree in both engines (the q44 discipline).
  *
  * Scale (100 TB): term counting is one map-side-combined aggregation on
  * (source, term); the rank window partitions by source and every later
  * stage sees only `topR` rows per source. Vocabulary never broadcasts and
  * the corpus never re-shuffles — the heavy relation is touched once.
  */
object Zipf {

  def fit(docs: DataFrame, textCol: String, sourceCol: String,
      topR: Int = 500): DataFrame = {
    require(topR >= 3, s"topR ($topR) must be >= 3 for a meaningful fit")
    val freq = docs
      .select(col(sourceCol).as("source"),
        explode(TextFns.tokens(col(textCol))).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("freq").desc, col("term").asc)
    val ranked = freq.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topR)
    def d6(c: Column): Column = round(c, 6).cast("decimal(18,6)")
    val pts = ranked.select(col("source"),
      d6(log(col("rank").cast("double"))).as("x"),
      d6(log(col("freq").cast("double"))).as("y"))
    val sums = pts.groupBy(col("source")).agg(
      count(lit(1)).as("n_terms"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val nd = col("n_terms").cast("double")
    def dd(name: String): Column = col(name).cast("double")
    val slope = (nd * dd("sxy") - dd("sx") * dd("sy")) /
      (nd * dd("sxx") - dd("sx") * dd("sx"))
    sums.select(col("source"), col("n_terms"),
      round(slope, 6).as("slope"),
      round((dd("sy") - slope * dd("sx")) / nd, 6).as("intercept"))
  }

  /** [[fit]] oracle: identical tokenization, tie-breaks, 6dp-decimal
    * quantization, exact decimal sums, and double fold.
    */
  def fitSql(table: String, textCol: String, sourceCol: String,
      topR: Int = 500): String = {
    def d6(e: String) = s"CAST(round($e, 6) AS DECIMAL(18,6))"
    def dd(name: String) = s"CAST($name AS DOUBLE)"
    val n = "CAST(n_terms AS DOUBLE)"
    val slope = s"(($n * ${dd("sxy")} - ${dd("sx")} * ${dd("sy")}) / " +
      s"($n * ${dd("sxx")} - ${dd("sx")} * ${dd("sx")}))"
    s"""WITH toks AS (
       |  SELECT $sourceCol AS source, unnest(${TextFns.tokensSql(textCol)}) AS term
       |  FROM $table),
       |freq AS (
       |  SELECT source, term, COUNT(*) AS freq FROM toks GROUP BY 1, 2),
       |ranked AS (
       |  SELECT source, freq,
       |         ROW_NUMBER() OVER (PARTITION BY source
       |           ORDER BY freq DESC, term ASC) AS rank
       |  FROM freq QUALIFY rank <= $topR),
       |pts AS (
       |  SELECT source,
       |         ${d6("ln(CAST(rank AS DOUBLE))")} AS x,
       |         ${d6("ln(CAST(freq AS DOUBLE))")} AS y
       |  FROM ranked),
       |sums AS (
       |  SELECT source, COUNT(*) AS n_terms,
       |         SUM(x) AS sx, SUM(y) AS sy,
       |         SUM(x * y) AS sxy, SUM(x * x) AS sxx
       |  FROM pts GROUP BY 1)
       |SELECT source, n_terms, round($slope, 6) AS slope,
       |       round((${dd("sy")} - $slope * ${dd("sx")}) / $n, 6) AS intercept
       |FROM sums""".stripMargin
  }
}
