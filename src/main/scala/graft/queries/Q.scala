package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared engine query: the Spark implementation plus (when SQL can
  * express it) an equivalent DuckDB oracle statement over the same parquet
  * tables. The driver hash-compares the two at sf0.01 (SURVEY.md §5).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Numeric helpers shared by every oracled query.
  *
  * Doubles summed in parallel are order-dependent, so a raw `sum(double)`
  * can differ between Spark and DuckDB in the last ulp and fail the hash
  * compare. Casting inputs to DECIMAL(18,2) first makes the aggregation
  * exact and engine-independent; the final cast back to double is then a
  * deterministic function of an exact value. Use these for every aggregate
  * the oracle checks.
  */
object Num {
  private val D = DecimalType(18, 2)

  /** Exact money/quantity representation of a double column. */
  def dec(c: Column): Column = c.cast(D)

  /** Engine-stable sum: exact decimal accumulation, double result. */
  def sumd(c: Column): Column = sum(dec(c)).cast("double")

  /** Engine-stable average: exact sum / exact count, double division. */
  def avgd(c: Column): Column =
    (sum(dec(c)).cast("double") / count(c)).cast("double")

  /** DuckDB fragments mirroring the above. */
  def sqlDec(col: String): String = s"CAST($col AS DECIMAL(18,2))"
  def sqlSumd(col: String): String = s"CAST(SUM(${sqlDec(col)}) AS DOUBLE)"
  def sqlAvgd(col: String): String =
    s"CAST(CAST(SUM(${sqlDec(col)}) AS DOUBLE) / COUNT($col) AS DOUBLE)"
}
