package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operators via flatMapGroupsWithState
  * (SURVEY.md §2.9 — the extension point beyond built-in windows).
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, ts: Timestamp, value: Double)

  /** Accumulated per-user state. */
  final case class UserStats(n: Long, sum: Double, lastTs: Long)

  /** Emitted when a user's activity pauses (no event for `gapMs` of event
    * time within the micro-batch stream) or on state timeout: a running
    * per-user summary — the custom-state analog of a session aggregate.
    */
  final case class UserSummary(user_id: Long, n: Long, sum: Double)

  final case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

  /** Per-user funnel state. `minView` is the earliest view (MaxValue =
    * none); `clicks`/`purchases` hold the DISTINCT event-time millis seen,
    * ascending, truncated to `maxKept` (capped flag set loudly when
    * truncation could have dropped the answer — see funnelStages).
    */
  final case class FunnelState(minView: Long, clicks: List[Long],
      purchases: List[Long], capped: Boolean)

  /** Deepest funnel stage per user after this batch: stage 0 = nothing,
    * 1 = viewed, 2 = clicked after the first view, 3 = purchased after
    * that click; t1..t3 are the step times (millis, -1 = unreached).
    */
  final case class FunnelProgress(user_id: Long, stage: Int,
      t1: Long, t2: Long, t3: Long, capped: Boolean)

  /** Streaming twin of the batch funnel (s21_funnel_steps): per-user
    * ordered view → click → purchase progress maintained across
    * micro-batches, correct under ARBITRARY cross-batch reordering.
    *
    * Why state must keep click/purchase TIMES rather than the resolved
    * step times: a view arriving late (earlier than every view seen so
    * far) lowers t1 and can retroactively make an already-seen click
    * eligible — resolved step times are not incrementally maintainable,
    * but (minView, click-time set, purchase-time set) is: every batch
    * folds new times in (a pure min/set-union, so re-delivered events are
    * idempotent by construction) and re-derives t2 = min click > t1,
    * t3 = min purchase > t2 from the small per-user sets. State is
    * O(distinct clicks+purchases per user), bounded by `maxKept` with a
    * loud `capped` marker (the StreamingDedup convention) — only a user
    * with > maxKept distinct click times could ever lose the true answer.
    */
  def funnelStages(spark: SparkSession, events: Dataset[FunnelEvent],
      maxKept: Int = 64): Dataset[FunnelProgress] = {
    import spark.implicits._
    def insert(xs: List[Long], t: Long): (List[Long], Boolean) = {
      if (xs.contains(t)) (xs, false)
      else {
        val merged = (t :: xs).sorted
        if (merged.size > maxKept) (merged.take(maxKept), true)
        else (merged, false)
      }
    }
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, batch, state: GroupState[FunnelState]) =>
          var st = state.getOption
            .getOrElse(FunnelState(Long.MaxValue, Nil, Nil, capped = false))
          batch.foreach { e =>
            val t = e.ts.getTime
            e.event_type match {
              case "view" => st = st.copy(minView = math.min(st.minView, t))
              case "click" =>
                val (xs, dropped) = insert(st.clicks, t)
                st = st.copy(clicks = xs, capped = st.capped || dropped)
              case "purchase" =>
                val (xs, dropped) = insert(st.purchases, t)
                st = st.copy(purchases = xs, capped = st.capped || dropped)
              case _ => ()
            }
          }
          state.update(st)
          val t1 = if (st.minView == Long.MaxValue) -1L else st.minView
          val t2 = if (t1 < 0) -1L
            else st.clicks.find(_ > t1).getOrElse(-1L)
          val t3 = if (t2 < 0) -1L
            else st.purchases.find(_ > t2).getOrElse(-1L)
          val stage = Seq(t1, t2, t3).takeWhile(_ >= 0).size
          Iterator.single(
            FunnelProgress(userId, stage, t1, t2, t3, st.capped))
      }
  }

  /** Running per-user counts/sums with explicit state: each micro-batch
    * folds its events into the state and emits the updated summary.
    * Demonstrates the managed-state API (the engine's escape hatch when
    * built-in windows can't express the semantics); state size is O(users).
    */
  def runningUserStats(spark: SparkSession, events: Dataset[UserEvent]): Dataset[UserSummary] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserStats, UserSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, batch, state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(0L, 0.0, Long.MinValue))
          val next = batch.foldLeft(prev) { (acc, e) =>
            UserStats(acc.n + 1, acc.sum + e.value,
              math.max(acc.lastTs, e.ts.getTime))
          }
          state.update(next)
          Iterator.single(UserSummary(userId, next.n, next.sum))
      }
  }
}
