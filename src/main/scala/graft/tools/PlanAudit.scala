package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false").config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, "/root/testdata/sf0.01")
        val plan = df.queryExecution.executedPlan.toString
        val joins = "(BroadcastHashJoin|SortMergeJoin|BroadcastNestedLoopJoin|CartesianProduct|ShuffledHashJoin)".r
          .findAllIn(plan).toSeq.groupBy(identity).map{case(k,v)=>s"$k x${v.size}"}.mkString(", ")
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        val wsc = "WholeStageCodegen".r.findAllIn(plan).size
        println(f"$name%-35s joins[$joins] shuffles=$exchanges codegenSpans=$wsc")
      } catch { case e: Throwable => println(s"$name AUDIT-ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
