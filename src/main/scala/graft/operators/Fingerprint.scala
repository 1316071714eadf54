package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Order-independent content fingerprints per partition group — the
  * cross-cluster data-validation tool: after a copy / migration / re-ingest,
  * compare per-partition (n_rows, fingerprint) pairs instead of moving or
  * sorting 100 TB twice. The reference's completed-ledger answers "did this
  * partition land"; this answers "did it land IDENTICAL".
  *
  * fingerprint = Σ md5Hash32(row_string) (mod 2^61-1): a commutative sum of
  * engine-portable row hashes, so it is insensitive to row order and
  * partitioning, mergeable across shards, and exactly replayable in SQL.
  * The caller supplies `rowStr` built ONLY from stably-rendered columns
  * (integers, strings, formatted dates, decimal-scaled numerics) — raw
  * doubles stringify differently across engines and are the one thing that
  * must not enter a fingerprint.
  *
  * Scale notes: one hash aggregation with map-side combine; the exchange
  * carries one (group, partial-sum) row per task per group. The modular sum
  * is held exactly in DECIMAL(38,0) before the final mod, so no overflow at
  * any row count below 10^28.
  */
object Fingerprint {

  /** 2^61 - 1 (Mersenne): big enough that collisions need ~2^30 groups,
    * small enough that HUGEINT/decimal mods agree everywhere.
    */
  val P = 2305843009213693951L

  /** (groupCols..., n_rows, fingerprint) per group. */
  def of(df: DataFrame, groupCols: Seq[Column], rowStr: Column): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(
        count(lit(1)).as("n_rows"),
        pmod(sum(TextFns.md5Hash32(rowStr).cast("decimal(38,0)")), lit(P))
          .cast("long").as("fingerprint"))

  /** DuckDB mirror: SELECT body over `rel` with the same group/row exprs. */
  def sql(rel: String, groupExprs: Seq[(String, String)], rowExpr: String): String = {
    val gsel = groupExprs.map { case (e, n) => s"$e AS $n" }.mkString(", ")
    val gby = groupExprs.indices.map(i => s"${i + 1}").mkString(", ")
    s"""SELECT $gsel, COUNT(*) AS n_rows,
       |  CAST(SUM(CAST(${TextFns.md5Hash32Sql(rowExpr)} AS HUGEINT)) % $P AS BIGINT)
       |    AS fingerprint
       |FROM $rel GROUP BY $gby""".stripMargin
  }
}
