package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.IntegerType

/** SparkSessionExtensions entry point (SURVEY.md §2.10/§4): registers
  * graft's custom Catalyst expressions as SQL functions, so e.g.
  * `spark.sql("SELECT dot_f32(a, b)")` or
  * `spark.sql("SELECT dhash_bmp(payload).hi")` plans the SAME native
  * codegen'd expression the Scala column API builds — one implementation,
  * two surfaces. Only the pure-function expressions are injected; the
  * plan-constant ones (`DsirScoreConst`, `NearestClusterConst`, …) carry
  * driver-trained state in their constructors and have no SQL-literal
  * encoding, so they stay Scala-API-only by design.
  *
  * Use at session build time:
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  * or on an existing session via `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    for ((name, clazz, build) <- GraftExtensions.all)
      e.injectFunction((
        FunctionIdentifier(name), new ExpressionInfo(clazz, name), build))
    // the native as-of join plans through a SparkStrategy; sessions built
    // with withExtensions get it without touching experimental APIs
    // (AsOfJoinNative.register remains the post-hoc path)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression = {
    exprs =>
      require(exprs.length == n,
        s"$name expects exactly $n argument(s), got ${exprs.length}")
      f(exprs)
  }

  /** A scalar parameter of a graft expression (resample rate, shingle
    * width) must arrive as a foldable SQL integer — it configures the
    * expression, it is not data.
    */
  private def constInt(name: String, e: Expression): Int = {
    require(e.foldable && e.dataType == IntegerType,
      s"$name expects a constant INT here, got ${e.sql}")
    e.eval().asInstanceOf[Int]
  }

  /** (sql name, implementing class, builder) for every injectable. */
  private[plans] val all: Seq[(String, String, Seq[Expression] => Expression)] =
    Seq(
      ("dot_f32", classOf[DotProductFloat].getName,
        arity("dot_f32", 2)(es => DotProductFloat(es.head, es(1)))),
      ("dhash_bmp", classOf[DHashBmp].getName,
        arity("dhash_bmp", 1)(es => DHashBmp(es.head))),
      ("audio_fp", classOf[AudioFp].getName,
        arity("audio_fp", 2)(es =>
          AudioFp(es.head, constInt("audio_fp(bin, dstRate)", es(1))))),
      ("image_dims", classOf[ImageDims].getName,
        arity("image_dims", 1)(es => ImageDims(es.head))),
      ("audio_meta", classOf[AudioMeta].getName,
        arity("audio_meta", 1)(es => AudioMeta(es.head))),
      ("exif_orient", classOf[ExifOrientation].getName,
        arity("exif_orient", 1)(es => ExifOrientation(es.head))),
      ("video_meta", classOf[VideoMeta].getName,
        arity("video_meta", 1)(es => VideoMeta(es.head))),
      ("flac_meta", classOf[FlacMeta].getName,
        arity("flac_meta", 1)(es => FlacMeta(es.head))),
      ("mp3_meta", classOf[Mp3Meta].getName,
        arity("mp3_meta", 1)(es => Mp3Meta(es.head))),
      ("word_shingles", classOf[WordShingles].getName,
        arity("word_shingles", 2)(es =>
          WordShingles(es.head, constInt("word_shingles(text, n)", es(1))))))

  /** Idempotent registration on an already-built session (tests, REPLs). */
  def register(spark: SparkSession): Unit =
    for ((name, _, build) <- all)
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, build, "built-in")
}
