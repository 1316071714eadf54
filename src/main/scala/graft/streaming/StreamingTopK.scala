package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming frequent-items (trending detection): the online form of the
  * t18 SpaceSaving aggregator. Items hash into `buckets` groups; each
  * group's `flatMapGroupsWithState` keeps ONE capacity-bounded SpaceSaving
  * summary in state (value → (est, err)), folds every micro-batch in, and
  * re-emits its current summary rows each batch (Update-mode semantics:
  * downstream sinks upsert on (bucket, value)).
  *
  * Reading the global top-k = merging ≤`buckets` bounded summaries — the
  * same mergeable-summaries contract the batch aggregator's merge() uses,
  * done at read time over a few hundred rows.
  *
  * Scale notes: state is O(buckets × capacity) — fixed, never grows with
  * the stream; the only shuffle keys on the hash bucket, so load spreads
  * evenly regardless of item skew (a hot ITEM lives in one bucket but its
  * updates are one state-slot increment per batch, not per event, after
  * the per-batch fold). The SpaceSaving invariant (est − err ≤ true ≤ est)
  * holds per bucket because every occurrence of an item routes to the same
  * bucket.
  */
object StreamingTopK {

  final case class SummaryRow(bucket: Int, value: String, est: Long, err: Long)

  final case class TopKState(counts: Map[String, (Long, Long)])

  /** `items`: a streaming frame with `itemCol`. Returns the per-batch
    * summary stream (bucket, value, est, err).
    */
  def frequentItems(items: DataFrame, itemCol: String, buckets: Int,
      capacity: Int): Dataset[SummaryRow] = {
    require(buckets >= 1 && capacity >= 1, "buckets and capacity must be >= 1")
    val spark = items.sparkSession
    import spark.implicits._
    items
      .select(col(itemCol).cast("string").as("value"),
        pmod(xxhash64(col(itemCol).cast("string")), lit(buckets)).cast("int")
          .as("bucket"))
      .as[(String, Int)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[TopKState, SummaryRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (bucket: Int, rows: Iterator[(String, Int)],
            state: GroupState[TopKState]) =>
          val counts = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
          counts ++= state.getOption.map(_.counts).getOrElse(Map.empty)
          rows.foreach { case (v, _) =>
            counts.get(v) match {
              case Some((c, e)) => counts(v) = (c + 1, e)
              case None if counts.size < capacity => counts(v) = (1L, 0L)
              case None =>
                // evict the minimum (count, value) entry, inherit its count
                // as the newcomer's error bound — SpaceSaving's step
                val (mv, (mc, _)) = counts.minBy { case (v2, (c2, _)) => (c2, v2) }
                counts.remove(mv)
                counts(v) = (mc + 1, mc)
            }
          }
          state.update(TopKState(counts.toMap))
          counts.toSeq.sortBy { case (v, (c, _)) => (-c, v) }
            .map { case (v, (c, e)) => SummaryRow(bucket, v, c, e) }
            .iterator
      }
  }
}
