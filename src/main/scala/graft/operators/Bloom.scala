package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns
import graft.plans.BloomTestAll

/** Bloom-filter decontamination — the approximate-membership form of the
  * t13 shingle-overlap gate (Decontaminate.overlapFlags), and the missing
  * member of the sketch family (KMV distinct / HLL / CountMin frequency /
  * SpaceSaving heavy hitters / Bloom membership).
  *
  * Why it matters at 100 TB: t13's exact gate ships the eval corpus'
  * distinct shingle SET into a broadcast semi-join — MBs of strings hashed
  * per probe. The Bloom form compresses that set into an m-BIT array
  * (m = 2^16 → 8 KB) with a bounded false-positive rate and NO false
  * negatives, so the probe is a fully NARROW projection over the training
  * scan: zero joins, zero extra shuffles — each doc tests its own shingles
  * against a compiled-in bitset inside the scan's codegen span. The only
  * exchange in the whole query is the final per-doc aggregation's.
  *
  * Engine-portable construction: bit j of shingle s is
  * `md5Hash32("j:" || s) mod m` (TextFns.md5Hash32 — exact integer math in
  * both engines), so the DuckDB oracle replays the exact same filter:
  * membership in the bit SET is equivalent to the bit-array test because a
  * bit is set iff SOME eval shingle hashed to that position. The flags —
  * including which docs are FALSE POSITIVES relative to t13 — are
  * deterministic and hash-compare exactly.
  */
object Bloom {

  /** The k bit positions of one element: md5Hash32("j:" || s) mod m. */
  def positions(s: Column, k: Int, m: Int): Column =
    array((0 until k).map(j =>
      pmod(TextFns.md5Hash32(concat(lit(s"$j:"), s)), lit(m.toLong))): _*)

  private def positionSql(j: Int, sExpr: String, m: Int): String =
    s"(${TextFns.md5Hash32Sql(s"'$j:' || $sExpr")} % $m)"

  /** Build the m-bit filter from the distinct n-shingles of `eval`'s
    * textCol. The collect is bounded by m DISTINCT positions regardless of
    * corpus size (m = 2^16 → at most 64 Ki longs pre-pack, 8 KB packed) —
    * the driver round-trip is summary-sized, like a centroid fetch.
    */
  def build(eval: DataFrame, textCol: String, n: Int, k: Int, m: Int): Array[Long] = {
    val spark = eval.sparkSession
    import spark.implicits._
    val pos = eval
      .select(explode(array_distinct(TextFns.shingles(col(textCol), n))).as("sh"))
      .select(explode(positions(col("sh"), k, m)).as("p"))
      .distinct().as[Long].collect()
    val bits = new Array[Long]((m + 63) / 64)
    pos.foreach(p => bits((p >> 6).toInt) |= 1L << (p & 63).toInt)
    bits
  }

  /** Merge two same-(k, m) filters: bitwise OR — per-source / per-day
    * filters combine without touching raw data (the incremental shape).
    */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, s"filter sizes differ: ${a.length} vs ${b.length}")
    Array.tabulate(a.length)(i => a(i) | b(i))
  }

  /** Per-training-doc probe against a built filter: (id, n_sh, n_maybe,
    * maybe_frac, maybe_contaminated) for every doc with >= 1 shingle.
    * `n_maybe` counts the doc's distinct shingles the filter MAYBE
    * contains (superset of t13's exact n_overlap — no false negatives).
    */
  def probeFlags(train: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, m: Int, bits: Array[Long], frac: Double): DataFrame =
    train
      .select(col(idCol).as("id"),
        array_distinct(TextFns.shingles(col(textCol), n)).as("sh"))
      .select(col("id"), size(col("sh")).cast("long").as("n_sh"),
        size(filter(col("sh"), s => BloomTestAll(positions(s, k, m), bits)))
          .cast("long").as("n_maybe"))
      .filter(col("n_sh") > 0)
      .withColumn("maybe_frac",
        col("n_maybe").cast("double") / col("n_sh").cast("double"))
      .withColumn("maybe_contaminated", col("maybe_frac") >= frac)

  /** DuckDB mirror of build+probe over one `table`: eval rows selected by
    * `evalPred`, train rows by its negation — the exact Bloom semantics
    * replayed as position-set membership (bit p set iff some eval shingle
    * maps to p).
    */
  def probeFlagsSql(table: String, idCol: String, textCol: String,
      n: Int, k: Int, m: Int, frac: Double, evalPred: String): String = {
    val posCols = (0 until k).map(j => positionSql(j, "sh", m))
    s"""WITH eval_sh AS (
       |  SELECT DISTINCT sh FROM (
       |    SELECT unnest(${TextFns.shinglesSql(textCol, n)}) AS sh
       |    FROM $table WHERE $evalPred)),
       |epos AS (
       |  SELECT DISTINCT p FROM (
       |    SELECT unnest([${posCols.mkString(", ")}]) AS p FROM eval_sh)),
       |train_sh AS (
       |  SELECT id, sh FROM (
       |    SELECT $idCol AS id,
       |      unnest(list_distinct(${TextFns.shinglesSql(textCol, n)})) AS sh
       |    FROM $table WHERE NOT ($evalPred))),
       |flagged AS (
       |  SELECT id, sh,
       |    (${posCols.map(p => s"$p IN (SELECT p FROM epos)").mkString(" AND ")}) AS maybe
       |  FROM train_sh),
       |perdoc AS (
       |  SELECT id, COUNT(*) AS n_sh,
       |    COALESCE(SUM(CASE WHEN maybe THEN 1 ELSE 0 END), 0) AS n_maybe
       |  FROM flagged GROUP BY id)
       |SELECT id, CAST(n_sh AS BIGINT) AS n_sh, CAST(n_maybe AS BIGINT) AS n_maybe,
       |  CAST(n_maybe AS DOUBLE) / CAST(n_sh AS DOUBLE) AS maybe_frac,
       |  CAST(n_maybe AS DOUBLE) / CAST(n_sh AS DOUBLE) >= $frac AS maybe_contaminated
       |FROM perdoc WHERE n_sh > 0""".stripMargin
  }
}
