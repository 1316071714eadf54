package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** The ONE KMV estimator expression every consumer shares (batch profiler
  * summaries, q24, p12's sketch algebra, the streaming s18 twin — the
  * streaming/batch agreement specs assume they use the same formula).
  */
object Kmv {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{lit, when}

  /** `(k-1)/h_k` bottom-k distinct estimate over the 32-bit hash space;
    * exact `cnt` while the sketch is unsaturated (`kth` null — callers
    * using a hash ARRAY get this via `try_element_at(arr, k)`, which is
    * null below k elements; plain element_at THROWS there under ANSI
    * mode, Spark 4's default).
    */
  def estimate(k: Int, cnt: Column, kth: Column): Column =
    when(kth.isNull, cnt.cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        (kth.cast("double") / lit(4294967296.0)))
}

/** Mutable bounded bottom-k buffer: a binary MAX-heap of the k smallest
  * values seen, plus a total element count. `heap(0)` is the largest of the
  * kept values, i.e. the k-th smallest overall once `size == k`.
  */
final class KmvBuf(var count: Long, var size: Int, var heap: Array[Long])
    extends Serializable

/** KMV (bottom-k) distinct-count sketch as a typed partial aggregator
  * (SURVEY.md §2.4 approx-distinct / §2.10 custom-UDAF surface).
  *
  * Input contract: values within a group are DISTINCT (callers dedup first,
  * e.g. `.distinct()`), so the bottom-k of a union is exactly the merge of
  * per-partition bottom-ks and `count` is the exact distinct count.
  *
  * Why not a window: `row_number() over (partition by g order by h)` sorts
  * EVERY distinct hash of a group to find rank k. This aggregator keeps a
  * bounded k-element heap per group inside each map task (ObjectHashAggregate
  * partial mode), so the exchange carries at most k values per (group,
  * partition) and nothing is ever globally sorted — at 100 TB the shuffle
  * shrinks from |distinct hashes| rows to k×partitions×|groups|.
  *
  * Output: (exact distinct count, k-th smallest value if count >= k). The
  * KMV estimate `(k-1) / (h_(k) / 2^32)` is left to the caller so the
  * estimator stays visible in the query (oracle-mirrored in SQL).
  */
final class BottomKSketch(k: Int)
    extends Aggregator[Long, KmvBuf, (Long, Option[Long])] {

  override def zero: KmvBuf = new KmvBuf(0L, 0, new Array[Long](k))

  /** offer h to the bottom-k heap (no count change). */
  private def offer(b: KmvBuf, h: Long): Unit = {
    if (b.size < k) { // grow: sift up
      var i = b.size
      b.heap(i) = h
      b.size += 1
      while (i > 0 && b.heap((i - 1) / 2) < b.heap(i)) {
        val p = (i - 1) / 2
        val t = b.heap(p); b.heap(p) = b.heap(i); b.heap(i) = t
        i = p
      }
    } else if (h < b.heap(0)) { // replace current k-th smallest: sift down
      b.heap(0) = h
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < b.size && b.heap(l) > b.heap(m)) m = l
        if (r < b.size && b.heap(r) > b.heap(m)) m = r
        if (m == i) done = true
        else {
          val t = b.heap(m); b.heap(m) = b.heap(i); b.heap(i) = t
          i = m
        }
      }
    }
  }

  override def reduce(b: KmvBuf, h: Long): KmvBuf = {
    b.count += 1
    offer(b, h)
    b
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    a.count += b.count
    var i = 0
    while (i < b.size) { offer(a, b.heap(i)); i += 1 }
    a
  }

  /** (exact distinct count, k-th smallest if the group has >= k values). */
  override def finish(b: KmvBuf): (Long, Option[Long]) =
    (b.count, if (b.size >= k) Some(b.heap(0)) else None)

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]

  override def outputEncoder: Encoder[(Long, Option[Long])] =
    ExpressionEncoder[(Long, Option[Long])]()
}

/** BottomKSketch variant that emits the kept values themselves (ascending)
  * — the STORED summary form. Bottom-k of a union equals bottom-k over the
  * union of per-part bottom-ks, so persisted per-partition heaps merge
  * later without the raw data (Profiler.incremental*: the incremental
  * ANALYZE shape — each ingest batch writes its summary row; a stats
  * refresh re-aggregates summaries, never rescans history).
  */
final class BottomKHeap(k: Int)
    extends Aggregator[Long, KmvBuf, Seq[Long]] {
  private val inner = new BottomKSketch(k)
  override def zero: KmvBuf = inner.zero
  override def reduce(b: KmvBuf, h: Long): KmvBuf = inner.reduce(b, h)
  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = inner.merge(a, b)
  override def finish(b: KmvBuf): Seq[Long] =
    b.heap.take(b.size).sorted.toSeq
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** Bottom-k plus the exact element count in one pass: the summary row KMV
  * set algebra needs (estimates when saturated, exact sets when not).
  * Input contract as above: values within a group are already distinct.
  */
final class BottomKSummary(k: Int)
    extends Aggregator[Long, KmvBuf, (Long, Seq[Long])] {
  private val inner = new BottomKSketch(k)
  override def zero: KmvBuf = inner.zero
  override def reduce(b: KmvBuf, h: Long): KmvBuf = inner.reduce(b, h)
  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = inner.merge(a, b)
  override def finish(b: KmvBuf): (Long, Seq[Long]) =
    (b.count, b.heap.take(b.size).sorted.toSeq)
  override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
  override def outputEncoder: Encoder[(Long, Seq[Long])] =
    ExpressionEncoder[(Long, Seq[Long])]()
}
