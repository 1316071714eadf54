package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, NamedExpression, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.SparkSession

/** Native as-of join: the full custom-operator path (SURVEY.md §2.10 ladder
  * step (c)) — logical node + planner Strategy + physical BinaryExecNode.
  *
  * Semantics match graft.operators.AsOfJoin.backward (union+window form):
  * for each left row attach the payload of the LAST right row with equal
  * key and right.time <= left.time, ties on time broken by the greatest
  * `rightTiebreak`; unmatched left rows get null payload.
  *
  * Why a physical operator when the composed form works: the union+window
  * plan materializes left+right into ONE sorted partition stream and runs a
  * window buffer over it; this exec instead declares hash distribution on
  * the keys and (key, time) ordering as requirements — Spark co-partitions
  * and sorts both sides (same exchanges as a sort-merge join) — and then
  * streams both iterators in ONE forward pass per partition with O(1) state
  * (the last matching payload), no window buffer, no union blowup.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    payload: Seq[NamedExpression], rightTiebreak: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.toAttribute.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, p, tb) =>
      AsOfJoinExec(lk, rk, lt, rt, p, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    payload: Seq[NamedExpression], rightTiebreak: Expression,
    left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.toAttribute.withNullability(true))

  /** Both sides hash-clustered on the key → co-partitioned exchanges. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  /** Left sorted by (key, time); right by (key, time, tiebreak) so the last
    * qualifying right row is the correct winner.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  protected override def doExecute(): RDD[InternalRow] = {
    // one ordering serves both sides, so the types must already agree —
    // fail loudly rather than compare a date day-count against micros
    require(leftKey.dataType == rightKey.dataType,
      s"as-of key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
    require(leftTime.dataType == rightTime.dataType,
      s"as-of time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val nPayload = payload.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val lKeyEval = UnsafeProjection.create(Seq(leftKey), left.output)
      val lTimeEval = UnsafeProjection.create(Seq(leftTime), left.output)
      val rKeyEval = UnsafeProjection.create(Seq(rightKey), right.output)
      val rTimeEval = UnsafeProjection.create(Seq(rightTime), right.output)
      val payloadProj = UnsafeProjection.create(payload.map(e => e: Expression), right.output)
      val nullPayload: InternalRow = new GenericInternalRow(nPayload)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output.map(a => a: Expression), output)

      var rRow: InternalRow = null
      var rKey: Any = null
      var rTime: Any = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next()
          rKey = rKeyEval(rRow).get(0, keyType)
          rTime = rTimeEval(rRow).get(0, timeType)
        } else rRow = null
      advanceRight()

      // prevLKey must be a COPY: projections reuse their output buffer, so a
      // value read out of one (UTF8String, Decimal, struct) aliases the
      // buffer and would compare equal to whatever the buffer holds next.
      var prevLKey: InternalRow = null
      var matchPayload: InternalRow = null

      lIter.map { lRow =>
        val lKeyRow = lKeyEval(lRow)
        val lKey = lKeyRow.get(0, keyType)
        val lTime = lTimeEval(lRow).get(0, timeType)
        // left key changed → any remembered match is stale
        if (prevLKey == null || prevLKey != lKeyRow) {
          matchPayload = null
          prevLKey = lKeyRow.copy()
        }
        // drop right rows for keys before lKey
        while (rRow != null && keyOrd.compare(rKey, lKey) < 0) advanceRight()
        // consume right rows of this key up to lTime; last one wins
        while (rRow != null && keyOrd.compare(rKey, lKey) == 0 &&
            timeOrd.compare(rTime, lTime) <= 0) {
          matchPayload = payloadProj(rRow).copy()
          advanceRight()
        }
        val p = if (matchPayload != null) matchPayload else nullPayload
        outProj(joined(lRow, p))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API + strategy registration. */
object AsOfJoinNative {

  /** Register the planner strategy on an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }

  /** Backward as-of join via the native operator; same contract as
    * graft.operators.AsOfJoin.backward.
    */
  def backward(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payloadCols: Seq[String], rightTiebreak: String): DataFrame = {
    val spark = leftDf.sparkSession
    register(spark)
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    // coerce the right-side key/time to the left's types (date→timestamp,
    // NTZ→TZ, …): one interpreted ordering serves both sides in the exec,
    // so raw physical values must be comparable
    def coerce(e: Expression, to: org.apache.spark.sql.types.DataType): Expression =
      if (e.dataType == to) e
      else org.apache.spark.sql.catalyst.expressions.Cast(e, to,
        Some(spark.sessionState.conf.sessionLocalTimeZone))
    val lk = attr(lPlan, leftKey)
    val lt = attr(lPlan, leftTime)
    val plan = AsOfJoinPlan(lPlan, rPlan,
      lk, coerce(attr(rPlan, rightKey), lk.dataType),
      lt, coerce(attr(rPlan, rightTime), lt.dataType),
      payloadCols.map(attr(rPlan, _)), attr(rPlan, rightTiebreak))
    ColumnBridge.ofRows(spark, plan)
  }
}
