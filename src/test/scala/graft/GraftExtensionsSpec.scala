package graft

import graft.plans.GraftExtensions

class GraftExtensionsSpec extends SparkSpec {

  test("dot_f32 is callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT dot_f32(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |               array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d""".stripMargin)
      .head().getDouble(0)
    assert(r == 11.0)
  }
}
