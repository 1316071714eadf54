package graft.util

import org.apache.spark.sql.DataFrame

/** Local-parallelism guard for CPU-heavy STAGE-1 work (round 12, from
  * `Tables.table`): on a real cluster a table scan arrives split across
  * many files/row groups and every core works stage 1; the local testdata
  * is one single-row-group file per table, so the scan is ONE task and
  * expensive pre-shuffle math (regex scoring, shingling, per-token md5,
  * join-probe levenshtein, dot products) serializes on one core. Spreading
  * to defaultParallelism — a few-MB local shuffle — makes local stage-1
  * math run parallel like a cluster's would. No-op (guard is false)
  * whenever the source is properly split, i.e. always at scale.
  *
  * Call it at the entry of OPERATORS whose stage-1 per-row work is
  * expensive — never blanket on every table read: a keyless
  * repartition(n) pays a full local sort of its input
  * (spark.sql.execution.sortBeforeRepartition, on by default so task
  * retries reproduce the same row placement — guide §2.5), so spreading a
  * scan whose downstream is one cheap projection/aggregation costs far
  * more than the serial stage it parallelizes. Round 12 measured the
  * blanket form at 0.9–1.7 s per query across ~200 queries (t09 2.46 →
  * 0.76 s without it) while only the genuinely compute-bound operators
  * (shingling, CountMin's md5 family) benefited.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val defaultPar = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < defaultPar) df.repartition(defaultPar) else df
  }
}
