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
