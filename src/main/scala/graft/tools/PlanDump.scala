package graft.tools
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `.explain("formatted")` for declared queries to one file per query
  * — the committed evidence behind plan-shape claims under plans/r11/.
  *
  * args: <outDir> <suffix>  (files land as <outDir>/<name>_<suffix>.txt)
  * SPARK_GRAFT_ONLY=e11,m15 restricts by name prefix (same contract as
  * Verify/Bench/PlanAudit). Each query is executed once (count) before the
  * explain so AQE's final plan — the one that actually ran — is printed,
  * not the pre-execution guess; skipMaterialize audits the dedup operators'
  * real plans rather than their checkpointed results.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = if (args.length > 1) args(1) else "plan"
    Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.skipMaterialize", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, "/root/testdata/sf0.01")
          df.count() // settle AQE so the dump shows the final physical plan
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          Files.write(outDir.resolve(s"${name}_$suffix.txt"),
            txt.getBytes("UTF-8"))
          println(s"$name ok (${txt.length} chars)")
        } catch { case e: Throwable =>
          println(s"$name DUMP-ERROR ${e.getMessage.take(120)}")
        }
      }
    spark.stop()
  }
}
