package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Dot products are unrolled over a known dimension into a flat chain of
  * codegen'd multiply-adds (left-associated), with every float element cast
  * to double before multiplying. The DuckDB `...Sql` twins emit the same
  * left-associated chain, so the IEEE-754 result is bit-identical across
  * engines — which is what lets cosine scores be oracle-compared without
  * tolerance.
  */
object VectorFns {

  /** Dot product of two array<float> columns: the native codegen'd loop
    * expression (see graft.plans.DotProductFloat). Bit-identical to the
    * unrolled left-associated chain (`dotUnrolled`) and the oracle SQL.
    */
  def dot(a: Column, b: Column, dim: Int): Column =
    graft.plans.DotProductFloat(a, b)

  /** Reference form: dim-unrolled element_at chain (slow in join conditions;
    * kept for tests asserting bit-equality with the native expression).
    */
  def dotUnrolled(a: Column, b: Column, dim: Int): Column =
    (1 to dim)
      .map(i => element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduceLeft(_ + _)

  def dotSql(a: String, b: String, dim: Int): String =
    (1 to dim)
      .map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  /** L2 norm. */
  def norm(a: Column, dim: Int): Column = sqrt(dot(a, a, dim))

  def normSql(a: String, dim: Int): String = s"sqrt(${dotSql(a, a, dim)})"

  /** Cosine similarity given precomputed norms (preferred in joins: norms
    * are computed once per row per side, not once per pair).
    */
  def cosineFromNorms(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)

  /** Dimension-agnostic dot product via higher-order functions — for ad-hoc
    * use where dim is unknown; the unrolled form is faster and is what the
    * oracle-compared operators use.
    */
  def dotDynamic(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Deterministic pseudo-random ±k/2 hyperplanes for sign-LSH, derived from
    * md5 so any engine can reproduce them. Component (h, d) is the value of
    * the first hex nibble of md5("h:<h>:<d>") minus 7.5 — mean-zero, exact
    * in binary floating point (halves), embedded as literals in both the
    * Spark plan and the oracle SQL.
    */
  def lshPlanes(numPlanes: Int, dim: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dim) { (h, d) =>
      md.reset()
      val hex = md.digest(s"h:$h:$d".getBytes(StandardCharsets.UTF_8))
      val nibble = (hex(0) & 0xff) >> 4
      nibble - 7.5
    }
  }

  /** Sign-LSH bucket string ('0'/'1' per plane) for an embedding column.
    * Projections use the const-weights loop expression — the unrolled
    * literal chain (planes × dim multiply-adds) exceeds Janino's method
    * limits and falls back to interpreted eval (see DotProductConst).
    */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.map { plane =>
      when(graft.plans.DotProductConst(v, plane) >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits.toIndexedSeq: _*)
  }

  def lshBucketSql(v: String, planes: Array[Array[Double]]): String =
    planes.map { plane =>
      val proj = plane.zipWithIndex
        .map { case (w, d) => s"CAST($v[${d + 1}] AS DOUBLE) * ($w)" }
        .mkString(" + ")
      s"CASE WHEN ($proj) >= 0 THEN '1' ELSE '0' END"
    }.mkString(" || ")
}
