package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Scored candidate for top-k selection. */
final case class Scored(query_id: Long, neighbor_id: Long, cos_sim: Double)

/** A ranked neighbor in the final top-k. */
final case class Ranked(query_id: Long, neighbor_id: Long, cos_sim: Double, rank: Long)

/** Typed partial top-k aggregator (SURVEY.md §2.10) — the scale path for
  * nearest-neighbor search.
  *
  * The window-function form (`row_number() <= k`) must shuffle EVERY scored
  * pair to a single partition per query before ranking. This Aggregator
  * instead keeps a bounded buffer of the best k candidates per query inside
  * each map task (partial aggregation), so the exchange carries at most
  * k rows per (query, partition) — at 100 TB the shuffle shrinks from
  * |corpus|×|queries| rows to k×partitions×|queries|.
  *
  * Ordering matches the window form exactly: score descending, neighbor id
  * ascending on ties — so the result is oracle-comparable to the same SQL.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[Scored, List[(Double, Long)], Seq[(Long, Double)]] {

  /** buffer: up to k (score, neighborId), kept sorted worst-first. */
  override def zero: List[(Double, Long)] = Nil

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, Long)], c: (Double, Long)): List[(Double, Long)] = {
    val merged = (c :: buf).sortWith((x, y) => better(y, x)) // worst-first
    if (merged.size > k) merged.drop(merged.size - k) else merged
  }

  override def reduce(buf: List[(Double, Long)], s: Scored): List[(Double, Long)] =
    insert(buf, (s.cos_sim, s.neighbor_id))

  override def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  /** best-first (score desc, id asc). */
  override def finish(buf: List[(Double, Long)]): Seq[(Long, Double)] =
    buf.reverse.map { case (score, id) => (id, score) }

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    ExpressionEncoder[Seq[(Long, Double)]]()
}

object TopKAggregator {
  /** Group scored candidates by query and rank the top k per query —
    * identical output contract to the window-function form.
    */
  def topK(scored: org.apache.spark.sql.Dataset[Scored], k: Int):
      org.apache.spark.sql.Dataset[Ranked] = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      .groupByKey(_.query_id)
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .flatMap { case (qid, neighbors) =>
        neighbors.zipWithIndex.map { case ((nid, score), i) =>
          Ranked(qid, nid, score, i + 1L)
        }
      }
  }
}
