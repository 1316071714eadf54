package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** plans.AdcLut — the constant-table ADC lookup expression the PQ serve
  * path builds its per-query LUTs with (Similarity.lutCol). The contract
  * under test: slot c is the left fold over ascending dimensions seeded
  * at 0.0 of `qq[offset+i] * cw(c)(i)` — the exact IEEE op sequence the
  * old literal-folded array column (and the DuckDB oracle's qscore
  * chain) computes — with gap slots exactly 0.0 and null/short vectors
  * yielding a null table; and the codegen path must agree with the
  * interpreted one bit for bit.
  */
class AdcLutSpec extends SparkSpec {
  import graft.plans.AdcLut

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("qq", ArrayType(LongType))))

  private def df(rows: Seq[Row]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), schema)

  private def luts(rows: Seq[Row], offset: Int,
      cw: Array[Array[Double]]): Map[Long, Seq[Double]] =
    df(rows).select(col("id"), AdcLut(col("qq"), offset, cw).as("lut"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1))).toMap

  // the reference fold: ((0.0 + q0*w0) + q1*w1) + ... in ascending order
  private def fold(q: Seq[Long], offset: Int, w: Array[Double]): Double =
    w.indices.foldLeft(0.0)((acc, i) => acc + q(offset + i).toDouble * w(i))

  test("AdcLut: per-slot dot products match the seeded left fold; " +
      "gap slots are exactly 0.0; codegen == interpreted") {
    val cw = Array(
      Array(0.5, -1.25, 3.0),
      Array(0.0, 0.0, 0.0),        // a gap slot (untrained cluster id)
      Array(1e-17, 1.0, -1e17))    // magnitudes where fold ORDER matters
    val rows = Seq(
      Row(1L, Seq(2L, 3L, 5L, 7L)),
      Row(2L, Seq(-4L, 0L, 1L, 9L)))
    val got = luts(rows, 1, cw)
    val want = rows.map(r => r.getLong(0) ->
      cw.toSeq.map(w => fold(r.getSeq[Long](1), 1, w))).toMap
    assert(got == want)
    assert(got(1L)(1) == 0.0)
    // interpreted eval path agrees with the codegen path bit for bit
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(luts(rows, 1, cw) == got)
    finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("AdcLut: null vector and too-short vector yield a NULL table " +
      "(nullable stays true under a non-null child)") {
    val cw = Array(Array(1.0, 2.0))
    val rows = Seq(
      Row(1L, Seq(10L, 20L, 30L)), // fits at offset 1
      Row(2L, Seq(10L, 20L)),      // offset 1 + dsub 2 > length 2 → null
      Row(3L, null))               // null vector → null
    val got = luts(rows, 1, cw)
    assert(got(1L) == Seq(fold(Seq(10L, 20L, 30L), 1, cw(0))))
    assert(got(2L) == null && got(3L) == null)
    assert(graft.plans.AdcLut(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("qq")),
      1, cw).nullable)
  }

  test("AdcLut: matches the literal-folded array column it replaced, " +
      "value for value") {
    // the pre-round-11 construction (Similarity.lutCol's old body),
    // rebuilt inline: per-slot chains of element_at·cast·multiply·lit
    val cw = Array(Array(0.125, -7.5), Array(2.0, 0.25), Array(-0.5, 1.5))
    val (offset, dsub) = (2, 2)
    val literal = array(cw.map { w =>
      (1 to dsub).foldLeft(lit(0.0)) { (acc, i) =>
        acc + element_at(col("qq"), offset + i).cast("double") * lit(w(i - 1))
      }
    }: _*)
    val rows = Seq(Row(1L, Seq(3L, 1L, 4L, 1L, 5L)), Row(2L, Seq(0L, 0L, -2L, 8L)))
    val both = df(rows).select(col("id"),
        AdcLut(col("qq"), offset, cw).as("a"), literal.as("b"))
      .collect()
    both.foreach(r => assert(r.getSeq[Double](1) == r.getSeq[Double](2),
      s"id=${r.getLong(0)}"))
  }
}
