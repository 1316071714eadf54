package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming near-duplicate detection: documents arrive as a stream and are
  * checked against the (growing) already-seen corpus — the online form of
  * `Dedup.minhashLshPairs`, and the reference's "skip what's already been
  * ingested" contract upgraded from exact ids to near-dup content.
  *
  * Shape: the per-doc MinHash signature is computed with the SAME narrow
  * expressions as the batch operator (one md5 pass per doc, no shuffle),
  * each doc explodes to its LSH band buckets, and a stateful
  * `flatMapGroupsWithState` keyed by bucket keeps the signatures seen in
  * that bucket. A new doc colliding with a stored one emits a candidate
  * pair with the signature-estimated Jaccard (matching components /
  * numHashes — exact integer ratio). Re-delivered ids are dropped
  * (idempotent, like the batch ledger), and a per-bucket cap bounds state
  * on adversarially hot buckets (the cap refuses NEW entries loudly in the
  * emitted relation rather than silently evicting history).
  *
  * Scale: state is O(buckets × bucket occupancy × signature width); the
  * shuffle key is the band bucket, so hot-bucket skew is bounded by the
  * cap. Exact verification (the batch op's verify join) would need original
  * shingle sets in state — deliberately NOT stored; candidates stream into
  * a downstream batch verify over the raw store instead.
  */
object StreamingDedup {

  final case class BandedDoc(bucket: String, id: Long, sig: Seq[Long])

  /** est_jaccard = matching signature components / numHashes; capped=true
    * rows mark docs REFUSED by a full bucket (no pair emitted for them).
    */
  final case class CandidatePair(id_a: Long, id_b: Long, est_jaccard: Double,
      capped: Boolean)

  /** `ids`/`sigs` are the admitted docs (zipped); `refused` records docs a
    * full bucket turned away, so a RE-DELIVERED refused doc is silent
    * instead of emitting a duplicate capped marker — idempotent re-delivery
    * holds for admitted and refused docs alike.
    */
  final case class BucketState(ids: List[Long], sigs: List[Seq[Long]],
      refused: List[Long])

  /** Candidate near-dup pairs for a STREAMING (idCol, textCol) frame. */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, numHashes: Int, rowsPerBand: Int, minEstJaccard: Double,
      maxPerBucket: Int = 10000): Dataset[CandidatePair] = {
    require(numHashes % rowsPerBand == 0,
      s"numHashes ($numHashes) must be a multiple of rowsPerBand ($rowsPerBand)")
    val spark = docs.sparkSession
    import spark.implicits._
    val numBands = numHashes / rowsPerBand
    // the SAME signature build as Dedup.minhashSignatures (shared core) —
    // batch and streaming candidates can never disagree on hashing
    val wide = Dedup.minhashWide(docs, idCol, textCol, n, numHashes)
    val bandSigs = (0 until numBands).map { j =>
      concat_ws("|", lit(j) +: ((j * rowsPerBand) until ((j + 1) * rowsPerBand))
        .map(i => col(s"m$i").cast("string")): _*)
    }
    val banded = wide
      .select(col("id"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"),
        explode(array(bandSigs: _*)).as("bucket"))
      .as[BandedDoc]
    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[BucketState]) =>
          var st = state.getOption.getOrElse(BucketState(Nil, Nil, Nil))
          // O(1) membership for the re-delivery test (the List state is
          // encoder-friendly; the Set is rebuilt once per group invocation,
          // not per row — a hot bucket stays O(cap), not O(cap²))
          var seen = st.ids.iterator.++(st.refused.iterator).toSet
          var admitted = st.ids.size
          val out = scala.collection.mutable.ArrayBuffer.empty[CandidatePair]
          // ascending id order: batch-internal pairs come out (lower, higher)
          // deterministically regardless of task scheduling
          for (d <- rows.toSeq.sortBy(_.id)) {
            if (!seen.contains(d.id)) {              // idempotent re-delivery
              seen += d.id
              if (admitted >= maxPerBucket) {
                out += CandidatePair(d.id, -1L, 0.0, capped = true)
                st = st.copy(refused = d.id :: st.refused)
              } else {
                for ((pid, psig) <- st.ids.zip(st.sigs)) {
                  val matching = psig.zip(d.sig).count { case (x, y) => x == y }
                  val est = matching.toDouble / d.sig.size
                  if (est >= minEstJaccard)
                    out += CandidatePair(math.min(pid, d.id),
                      math.max(pid, d.id), est, capped = false)
                }
                st = BucketState(d.id :: st.ids, d.sig :: st.sigs, st.refused)
                admitted += 1
              }
            }
          }
          state.update(st)
          out.iterator
      }
      // the same pair can surface from several bands (batch op dedups with
      // DISTINCT; a streaming global distinct would need its own state —
      // downstream verify is already idempotent, so duplicates are benign)
  }
}
