package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the bridge is
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is private[sql].
  * This shim (in an org.apache.spark.sql subpackage, the standard extension
  * technique) re-exports just the two conversions graft's custom Catalyst
  * expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Build a DataFrame from a (resolved) logical plan — classic
    * Dataset.ofRows is private[sql].
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan):
      org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** True when no `persist`ed relation is registered in the session's cache
    * (the CacheManager is private[sql]) — the hygiene assertion that the
    * dedup operators release their shared cached relations on return.
    * localCheckpoint block cleanup is the context cleaner's job and is NOT
    * visible here; this sees exactly what `df.persist` registers.
    */
  def noCachedRelations(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
