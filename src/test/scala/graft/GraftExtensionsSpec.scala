package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans._
import graft.queries.MultimodalQueries

/** SQL-surface parity for the expression family: every function injected
  * by [[GraftExtensions]] must (a) plan the SAME Catalyst expression class
  * the Scala column API builds — one implementation, two surfaces — and
  * (b) return byte-identical results on the committed fixture payloads.
  */
class GraftExtensionsSpec extends SparkSpec {

  private def registered(): Unit = GraftExtensions.register(spark)

  /** SQL path over a fixture table vs the Scala-API column on the same
    * table: identical rows AND the analyzed SQL plan carries the
    * expression class (not a UDF shim or a re-parse into something else).
    */
  private def parity[E <: org.apache.spark.sql.catalyst.expressions.Expression](
      fixture: String, sqlExpr: String, apiCol: Column)(
      implicit tag: scala.reflect.ClassTag[E]): Unit = {
    registered()
    spark.read.parquet(fixture).createOrReplaceTempView("fx")
    val viaSql = spark.sql(s"SELECT name, $sqlExpr AS v FROM fx ORDER BY name")
    val viaApi = spark.read.parquet(fixture)
      .select(col("name"), apiCol.as("v")).orderBy("name")
    val planned = viaSql.queryExecution.analyzed.exists(
      _.expressions.exists(_.exists(e => tag.runtimeClass.isInstance(e))))
    assert(planned, s"SQL plan does not carry ${tag.runtimeClass.getSimpleName}")
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq, sqlExpr)
    assert(viaSql.count() > 0, s"$fixture is empty")
  }

  test("dot_f32 is callable from SQL after registration") {
    registered()
    val r = spark.sql(
      """SELECT dot_f32(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |               array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d""".stripMargin)
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("dhash_bmp: SQL plans the codegen expression and matches the column API") {
    parity[DHashBmp](MultimodalQueries.dhashFixturePath,
      "dhash_bmp(payload)", DHashBmp(col("payload")))
  }

  test("audio_fp: constant dstRate arrives as a SQL literal") {
    parity[AudioFp](MultimodalQueries.audioFpFixturePath,
      "audio_fp(payload, 6000)", AudioFp(col("payload"), dstRate = 6000))
  }

  test("image_dims / exif_orient over the image fixtures") {
    parity[ImageDims](MultimodalQueries.imageFixturePath,
      "image_dims(payload)", ImageDims(col("payload")))
    parity[ExifOrientation](MultimodalQueries.exifFixturePath,
      "exif_orient(payload)", ExifOrientation(col("payload")))
  }

  test("audio_meta / flac_meta / mp3_meta / video_meta over the media fixtures") {
    parity[AudioMeta](MultimodalQueries.audioFixturePath,
      "audio_meta(payload)", AudioMeta(col("payload")))
    parity[FlacMeta](MultimodalQueries.flacFixturePath,
      "flac_meta(payload)", FlacMeta(col("payload")))
    parity[Mp3Meta](MultimodalQueries.mp3FixturePath,
      "mp3_meta(payload)", Mp3Meta(col("payload")))
    parity[VideoMeta](MultimodalQueries.videoFixturePath,
      "video_meta(payload)", VideoMeta(col("payload")))
  }

  test("word_shingles from SQL shingles like the Scala API") {
    registered()
    val got = spark.sql(
      "SELECT word_shingles('the quick brown fox', 3) AS sh")
      .head().getSeq[String](0)
    assert(got == Seq("the quick brown", "quick brown fox"))
    // non-constant width is rejected loudly, not silently mis-planned
    val err = intercept[Exception] {
      spark.sql("SELECT word_shingles('a b c', CAST(id AS INT)) FROM range(1)")
        .collect()
    }
    assert(err.getMessage.contains("constant INT"))
  }

  test("misconfigured arity fails at plan time with the function name") {
    registered()
    val err = intercept[Exception] {
      spark.sql("SELECT dhash_bmp(X'00', X'00')").collect()
    }
    assert(err.getMessage.contains("dhash_bmp"))
  }
}
