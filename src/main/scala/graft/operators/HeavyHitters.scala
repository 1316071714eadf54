package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable SpaceSaving buffer: value -> (estimated count, max overcount). */
final class SpaceSavingBuf(
    val counts: scala.collection.mutable.HashMap[String, (Long, Long)])
    extends Serializable

/** SpaceSaving frequent-items sketch as a typed partial aggregator — the
  * heavy-hitters companion to the KMV bottom-k sketch (vocabulary heads,
  * hot URLs/domains, template detection in a training-data pipeline).
  *
  * Per-partition the classic algorithm: a bounded `capacity`-entry table;
  * a full table evicts its minimum-count entry, and the newcomer inherits
  * that minimum as both its starting count and its recorded overcount
  * `err` — maintaining the invariant est - err <= true <= est. Merge (the
  * mergeable-summaries form): a key absent from one side contributes that
  * side's minimum count to both est and err (its true count there cannot
  * exceed the min), then the union is trimmed back to `capacity` by
  * (est desc, value asc). Shuffle cost is capacity entries per partition
  * per group, independent of stream length or distinct count — at 100 TB
  * the exact GROUP BY alternative shuffles every distinct value.
  *
  * EXACT regime: when every partial table stays under `capacity` (bounded
  * vocabularies — the declared t18 query sizes capacity above the corpus
  * vocabulary), no eviction ever happens, every err is 0, and the sketch
  * IS the exact counts — which is what lets the oracle hash-compare it.
  * The approximate regime's guarantees are property-checked in
  * OperatorsSpec instead (eviction order is arrival-order dependent, so
  * approximate results are not cross-engine deterministic).
  *
  * Output: top `k` as (value, est, err, rank), rank by (est desc, value
  * asc).
  */
final class SpaceSavingSketch(capacity: Int, k: Int)
    extends Aggregator[String, SpaceSavingBuf, Seq[(String, Long, Long, Long)]] {
  require(capacity >= k, s"capacity ($capacity) must be >= k ($k)")

  override def zero: SpaceSavingBuf =
    new SpaceSavingBuf(scala.collection.mutable.HashMap.empty)

  /** Minimum (count, value)-ordered entry — value tiebreak keeps eviction
    * deterministic for a fixed arrival order.
    */
  private def minEntry(b: SpaceSavingBuf): (String, (Long, Long)) =
    b.counts.minBy { case (v, (c, _)) => (c, v) }

  override def reduce(b: SpaceSavingBuf, v: String): SpaceSavingBuf = {
    b.counts.get(v) match {
      case Some((c, e)) => b.counts(v) = (c + 1, e)
      case None if b.counts.size < capacity => b.counts(v) = (1L, 0L)
      case None =>
        val (mv, (mc, _)) = minEntry(b)
        b.counts.remove(mv)
        b.counts(v) = (mc + 1, mc)
    }
    b
  }

  override def merge(a: SpaceSavingBuf, b: SpaceSavingBuf): SpaceSavingBuf = {
    val aMin = if (a.counts.size < capacity) 0L else minEntry(a)._2._1
    val bMin = if (b.counts.size < capacity) 0L else minEntry(b)._2._1
    val union = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    for ((v, (c, e)) <- a.counts) {
      val (bc, be) = b.counts.getOrElse(v, (bMin, bMin))
      union(v) = (c + bc, e + be)
    }
    for ((v, (c, e)) <- b.counts if !a.counts.contains(v))
      union(v) = (c + aMin, e + aMin)
    val trimmed =
      if (union.size <= capacity) union
      else {
        val kept = union.toSeq
          .sortBy { case (v, (c, _)) => (-c, v) }
          .take(capacity)
        scala.collection.mutable.HashMap(kept: _*)
      }
    new SpaceSavingBuf(trimmed)
  }

  override def finish(b: SpaceSavingBuf): Seq[(String, Long, Long, Long)] =
    b.counts.toSeq
      .sortBy { case (v, (c, _)) => (-c, v) }
      .take(k)
      .zipWithIndex
      .map { case ((v, (c, e)), i) => (v, c, e, i + 1L) }

  override def bufferEncoder: Encoder[SpaceSavingBuf] = Encoders.kryo[SpaceSavingBuf]

  override def outputEncoder: Encoder[Seq[(String, Long, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long, Long)]]()
}
