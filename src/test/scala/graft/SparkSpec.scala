package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per JVM via getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  // local[4, 2]: 4 threads, TWO task attempts — real clusters retry failed
  // tasks constantly, so specs can inject a first-attempt failure and
  // assert results are retry-invariant (RetrySpec). Identical scheduling
  // otherwise.
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4, 2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), name)
    d.toFile.deleteOnExit()
    d.toString
  }

  /** DETERMINISTIC mid-stream kill for the ingest-pipeline stream specs:
    * wraps a per-batch thunk (the index/state resolver every pipeline
    * invokes inside foreachBatch) so its `killOnCall`-th invocation
    * throws, ONCE. Because Structured Streaming writes a batch's offsets
    * BEFORE running foreachBatch, the dying batch is already planned in
    * the offset log — the restart replays it with the exact same file
    * set, so batch boundaries (and therefore batch_dup-vs-corpus_dup
    * labels) are reproducible. A `StreamingQuery.stop()`-based kill has
    * no such guarantee: stopping before the next batch's offsets commit
    * lets the restart RE-PLAN the remaining files into different
    * micro-batches (observed: two source files merging into one batch,
    * flipping a corpus_dup into a batch_dup).
    */
  def killingThunk[T](killOnCall: Option[Int], underlying: () => T): () => T = {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val killed = new java.util.concurrent.atomic.AtomicBoolean(false)
    () => {
      if (killOnCall.contains(calls.incrementAndGet()) &&
          killed.compareAndSet(false, true))
        throw new RuntimeException("injected mid-stream kill")
      underlying()
    }
  }

  /** Drive a stream to completion, or let the injected kill take it down
    * (`expectKill`) — the companion of [[killingThunk]].
    */
  def driveStream(q: org.apache.spark.sql.streaming.StreamingQuery,
      expectKill: Boolean): Unit =
    if (expectKill) {
      try { q.processAllAvailable(); q.stop() }
      catch { case _: Exception => () } // the injected kill surfaces here
      try q.awaitTermination()
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    } else {
      q.processAllAvailable()
      q.stop(); q.awaitTermination()
    }
}
