package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per JVM via getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  // local[4, 2]: 4 threads, TWO task attempts — real clusters retry failed
  // tasks constantly, so specs can inject a first-attempt failure and
  // assert results are retry-invariant (RetrySpec). Identical scheduling
  // otherwise.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), name)
    d.toFile.deleteOnExit()
    d.toString
  }
}
