package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.Zipf

class ZipfSpec extends SparkSpec {

  /** One doc per source holding each word w{i} exactly freq(i) times. */
  private def corpus(freqs: Map[String, Seq[Int]]) = {
    val rows = freqs.toSeq.map { case (src, fs) =>
      val text = fs.zipWithIndex
        .flatMap { case (f, i) => Seq.fill(f)(s"w$i") }.mkString(" ")
      Row(src, text)
    }
    val schema = StructType(Seq(
      StructField("source", StringType), StructField("text", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  /** The operator's own arithmetic, replayed: 6dp-quantized logs, exact
    * sums, closed-form OLS, 6dp output round.
    */
  private def ols(freqsDesc: Seq[Int]): (Double, Double) = {
    def q6(v: Double) = math.rint(v * 1e6) / 1e6
    val pts = freqsDesc.zipWithIndex.map { case (f, i) =>
      (q6(math.log(i + 1.0)), q6(math.log(f.toDouble))) }
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    (q6(slope), q6((sy - slope * sx) / n))
  }

  test("perfect power-law vocabulary fits slope ~ -1") {
    // freq(rank) = 512 / rank exactly, ranks 1..8 (all integer)
    val fs = Seq(512, 256, 171, 128, 102, 85, 73, 64)
    val got = Zipf.fit(corpus(Map("a" -> fs)), "text", "source", topR = 8)
      .collect().head
    assert(got.getString(0) == "a" && got.getLong(1) == 8L)
    val (eSlope, eInt) = ols(fs)
    assert(math.abs(got.getDouble(2) - eSlope) < 2e-6,
      s"slope ${got.getDouble(2)} vs $eSlope")
    assert(math.abs(got.getDouble(3) - eInt) < 2e-6)
    assert(math.abs(got.getDouble(2) + 1.0) < 0.05, "power law should fit ~ -1")
  }

  test("sources fit independently and topR caps the ranked vocabulary") {
    val flat = Seq(10, 10, 10, 10, 10, 9) // near-flat: slope ~ 0
    val steep = Seq(1000, 10, 10, 3, 2, 1)
    val out = Zipf.fit(corpus(Map("flat" -> flat, "steep" -> steep)),
      "text", "source", topR = 4)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("flat").getLong(1) == 4L && out("steep").getLong(1) == 4L)
    val (eFlat, _) = ols(flat.take(4))
    val (eSteep, _) = ols(steep.take(4))
    assert(math.abs(out("flat").getDouble(2) - eFlat) < 2e-6)
    assert(math.abs(out("steep").getDouble(2) - eSteep) < 2e-6)
    assert(out("steep").getDouble(2) < out("flat").getDouble(2))
  }
}
