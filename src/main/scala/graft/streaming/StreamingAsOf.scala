package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING event-time as-of join — the operator Structured Streaming
  * lacks natively (stream-stream joins support equality + interval
  * conditions, not "latest right row at-or-before each left row"). The
  * classic instance: enrich every trade with the prevailing quote.
  *
  * Semantics (event time, watermark-aligned): a trade at event time T is
  * held in state until the watermark passes T — at which point every
  * quote with ts <= T has arrived, by the watermark contract — and is
  * then emitted EXACTLY ONCE, matched to the latest quote with
  * quote.ts <= T (unmatched trades emit matched=false). This is the
  * batch backward as-of (s04/s07) lifted to streams: the batch-agreement
  * spec replays the same events through both paths.
  *
  * Correct under arbitrary cross-batch reordering WITHIN the watermark
  * delay: a quote arriving batches later but with an earlier event time
  * still wins, because no trade it could affect has been emitted yet.
  * Same-timestamp quotes keep the max value (arrival order must not
  * matter); re-delivered trade ids are dropped both while pending (by id)
  * and after emission (a bounded recently-emitted set, the StreamingDedup
  * discipline — loud `capped` marker when a bound could have cost the
  * true answer).
  *
  * Scale: state is per KEY (symbol): the quote buffer is pruned to
  * quotes at-or-after the latest one still matchable by any future or
  * pending trade, and pending trades drain as the watermark advances —
  * steady-state size tracks (event rate × watermark delay) per key, the
  * same bound as Spark's own stream-stream interval join. Hot keys are
  * ordinary group skew (AQE/state-store partitioning).
  */
object StreamingAsOf {

  /** One merged input stream: side = "quote" carries `value`; side =
    * "trade" carries `id` (unique per trade) and `value` (trade qty/px,
    * passed through).
    */
  final case class AsOfEvent(key: String, side: String, ts: Timestamp,
      id: Long, value: Double)

  /** quotes: (tsMillis, value) ascending, pruned; pending: (tsMillis, id,
    * value) ascending trades not yet past the watermark; emitted: most
    * recent trade ids already emitted (re-delivery guard).
    */
  final case class AsOfState(quotes: List[(Long, Double)],
      pending: List[(Long, Long, Double)], emitted: List[Long],
      capped: Boolean)

  final case class AsOfMatch(key: String, trade_id: Long, trade_ts: Long,
      trade_value: Double, matched: Boolean, quote_ts: Long,
      quote_value: Double, capped: Boolean)

  /** `delay` is the watermark (late-data bound) on `ts`. `maxKept` bounds
    * each of the three per-key lists; exceeding it sets `capped` on every
    * subsequent emission for that key (loud, never silent).
    *
    * `idleRetention` (OPT-IN, default None = retain forever) bounds state
    * in KEY CARDINALITY, not just per key: a key whose last quote is
    * `idleRetention` older than the watermark and that has no pending
    * trades is EVICTED (state.remove via event-time timeout) — without
    * it, every symbol ever seen pins its pruned quote list forever, so
    * long-running deployments over unbounded key spaces should set it.
    * It is opt-in because eviction DIVERGES from the batch as-of oracle:
    * a trade arriving for an idled-out key emits matched=false where the
    * batch backward join would still match the old quote — and that miss
    * is indistinguishable from a genuine as-of miss (no loud marker is
    * possible once state is gone). Default-off keeps stream≡batch parity
    * exact; enabling it is an explicit state-size-for-semantics trade.
    *
    * Exactly-once caveat under eviction: the per-key emitted-id digest is
    * dropped with the rest of the state, so after an eviction a
    * re-delivered trade id is guarded only by Spark's late-row filter —
    * exactly-once then additionally assumes re-deliveries carry their
    * ORIGINAL event time (a duplicate re-stamped with a fresher event
    * time would emit the same trade_id twice). With idleRetention unset
    * the digest outlives every quote and the stronger id-based guarantee
    * holds (up to the loud `capped` bound).
    */
  def asOfJoinStream(spark: SparkSession, events: Dataset[AsOfEvent],
      delay: String, maxKept: Int = 1024,
      idleRetention: Option[String] = None): Dataset[AsOfMatch] = {
    import spark.implicits._
    val ttlMs: Option[Long] = idleRetention.map(intervalMs)
    ttlMs.foreach(t =>
      require(t > 0, s"idleRetention must be positive: $idleRetention"))
    events
      .withWatermark("ts", delay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfState, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, batch, state: GroupState[AsOfState]) =>
          var st = state.getOption.getOrElse(
            AsOfState(Nil, Nil, Nil, capped = false))
          // fold the batch in — ONE merge + sort per invocation, Set
          // membership for the id guards (state stays encoder-friendly
          // Lists; the per-event work is O(1) map/set ops). Idempotent:
          // quotes dedupe by (ts -> max value), trades dedupe by id
          // against pending AND emitted.
          val (qEvs, tEvs) = batch.toSeq.partition(_.side == "quote")
          var capped = st.capped
          if (qEvs.nonEmpty) {
            val qmap = scala.collection.mutable.LongMap[Double]()
            st.quotes.foreach { case (t, v) => qmap(t) = v }
            qEvs.foreach { e =>
              val t = e.ts.getTime
              if (!qmap.contains(t) || qmap(t) < e.value) qmap(t) = e.value
            }
            var quotes = qmap.toList.sortBy(_._1)
            if (quotes.size > maxKept) {
              quotes = quotes.takeRight(maxKept); capped = true
            }
            st = st.copy(quotes = quotes)
          }
          if (tEvs.nonEmpty) {
            val seen = scala.collection.mutable.Set[Long]()
            st.pending.foreach(p => seen += p._2)
            st.emitted.foreach(seen += _)
            val fresh = tEvs.flatMap { e =>
              if (seen.add(e.id)) Some((e.ts.getTime, e.id, e.value)) else None
            }
            var pending = (fresh.toList ::: st.pending).sortBy(p => (p._1, p._2))
            if (pending.size > maxKept) {
              pending = pending.take(maxKept); capped = true
            }
            st = st.copy(pending = pending)
          }
          st = st.copy(capped = capped)
          val wm = state.getCurrentWatermarkMs()
          // emit every pending trade the watermark has STRICTLY passed,
          // matched to the latest quote at-or-before its event time.
          // Strict (<, not <=) on purpose: Spark's late-row filter admits
          // rows with event time == the current watermark, so a quote at
          // exactly wm can still legally arrive after this batch — a trade
          // at wm released now could miss it. It drains one watermark tick
          // later instead (the timeout below guarantees the tick fires).
          val (ready, stillPending) = st.pending.partition(_._1 < wm)
          val out = ready.map { case (tts, id, tv) =>
            st.quotes.filter(_._1 <= tts).lastOption match {
              case Some((qts, qv)) =>
                AsOfMatch(key, id, tts, tv, matched = true, qts, qv, st.capped)
              case None =>
                AsOfMatch(key, id, tts, tv, matched = false, -1L, 0.0, st.capped)
            }
          }
          val emittedAll = ready.map(_._2).reverse ::: st.emitted
          val emitted = emittedAll.take(maxKept)
          // dropping re-delivery guards is as loud as dropping data: a
          // truncated id could be re-admitted and emitted twice
          if (emittedAll.sizeIs > maxKept) capped = true
          // prune quotes: any future need is at event time >= floor, so
          // only the latest quote at-or-before floor and everything after
          // it can ever be the answer. Floor is min(pending, wm) — wm
          // itself, not wm+1, because a future trade can carry event time
          // exactly wm (the same boundary rule as the strict release).
          val floor = (stillPending.headOption.map(_._1).toList :+ wm).min
          val keepFrom = st.quotes.filter(_._1 <= floor).lastOption.map(_._1)
          val quotes = keepFrom match {
            case Some(k0) => st.quotes.dropWhile(_._1 < k0)
            case None => st.quotes
          }
          if (stillPending.isEmpty && out.isEmpty && qEvs.isEmpty &&
              ttlMs.exists(t => quotes.forall(_._1 + t <= wm))) {
            // idle eviction (opt-in): nothing pending, nothing new this
            // batch, and every retained quote is idleRetention past the
            // watermark — drop the key's state entirely (bounded key
            // cardinality). Never taken when idleRetention is unset.
            state.remove()
          } else {
            st = st.copy(quotes = quotes, pending = stillPending,
              emitted = emitted, capped = capped)
            state.update(st)
            // wake this key up when the watermark can next release a trade
            // (strict release ⇒ wm must EXCEED the trade ts), or — idle
            // with eviction enabled — when its quotes become evictable.
            // Idle keys without a TTL set no timeout: there is nothing a
            // wake could do for them, and skipping it avoids re-invoking
            // every dormant key on every watermark advance.
            val wake: Option[Long] = stillPending.headOption match {
              case Some((tts, _, _)) => Some(math.max(tts + 1, wm + 1))
              case None => ttlMs.map(t => math.max(
                quotes.lastOption.map(_._1 + t).getOrElse(wm + 1), wm + 1))
            }
            wake.foreach(state.setTimeoutTimestamp)
          }
          out.iterator
      }
  }

  /** "N unit" interval string → milliseconds (day-time units only — the
    * watermark-delay grammar; months would be calendar-dependent).
    */
  private[streaming] def intervalMs(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"calendar months not supported: $s")
    iv.days * 86400000L + iv.microseconds / 1000L
  }
}
