package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      // audit the dedup operators' REAL plans, not their checkpointed results
      .config("spark.graft.skipMaterialize","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_ONLY=e05,q2 restricts the audit (same contract as Verify)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
      .foreach { case (name, fn) =>
      try {
        val df = fn(spark, "/root/testdata/sf0.01")
        df.count() // settle AQE: joins/codegen below reflect the FINAL plan
        val plan = df.queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan.toString
          case p => p.toString
        }
        val joins = "(BroadcastHashJoin|SortMergeJoin|BroadcastNestedLoopJoin|CartesianProduct|ShuffledHashJoin)".r
          .findAllIn(plan).toSeq.groupBy(identity).map{case(k,v)=>s"$k x${v.size}"}.mkString(", ")
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        // whole-stage codegen spans print as "*(n)" stage markers
        val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).toSeq
          .distinct.size
        // bound at end-of-line: Spark TRUNCATES long ReadSchema strings
        // (no closing '>'), and an unbounded [^>]* would gobble plan text
        // until some later '>' and inflate the count; a truncated schema
        // is reported as "N+" (N fields visible before the cut)
        val scans = "ReadSchema: struct<([^>\n]*)".r
          .findAllMatchIn(plan).map { mm =>
            val g = mm.group(1)
            val n = g.count(_ == ':')
            if (g.endsWith("...")) s"$n+" else s"$n"
          }.toSeq
          .groupBy(identity).toSeq.sortBy(_._1)
          .map { case (w, xs) => if (xs.size > 1) s"$w x${xs.size}" else s"$w" }
        println(f"$name%-35s joins[$joins] shuffles=$exchanges codegenSpans=$wsc scanCols=[${scans.mkString(", ")}]")
      } catch { case e: Throwable => println(s"$name AUDIT-ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
