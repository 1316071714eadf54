package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The BENCH POINT behind IntervalJoinSpec's planted-burst skew test
  * (VERDICT r5 task 5): times `IntervalJoin.binnedTimePairs` on an input
  * whose right side packs `n` rows into ONE tolerance bucket (an event
  * burst — the s25/d23 hot-bucket scenario), with AQE skew-join ON vs
  * OFF. OFF leaves the whole hot bucket's |L_b|·|R_b| work in single
  * straggler tasks; ON (OptimizeSkewedJoin) splits the oversized shuffle
  * partition into parallel sub-reads. Skew thresholds are lowered so the
  * rewrite fires at local bench scale — at 100 TB the DEFAULT thresholds
  * fire on real burst sizes (the spec asserts the same `skew=true` plan
  * marker).
  *
  * Usage: runMain graft.tools.SkewBench [burstRows] [probes]
  * Prints one JSON line {"burst_rows":N,"probes":P,"aqe_on_sec":..,
  * "aqe_off_sec":..,"pairs":..,"speedup":..}.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val probes = args.lift(1).map(_.toInt).getOrElse(64)
    val root = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    root.sparkContext.setLogLevel("WARN")
    val tolUs = 1000000L // 1s buckets

    def run(skewOn: Boolean): (Double, Long) = {
      val s = root.newSession()
      s.conf.set("spark.sql.adaptive.enabled", skewOn)
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn)
      if (skewOn) {
        s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
        s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      }
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep the shuffle join
      import s.implicits._
      val pad = "x" * 64
      // burst: n rows inside one 1s window, plus a small uniform tail so the
      // shuffle has non-hot partitions to compare against
      val right = s.range(n)
        .select(timestamp_micros(lit(5000000L) + (col("id") % 1000) * 1000L).as("r_ts"),
          concat(lit(pad), col("id")).as("r_tag"))
        .unionAll(s.range(10000)
          .select(timestamp_micros(lit(3600000000L) + col("id") * 1700000L).as("r_ts"),
            concat(lit(pad), col("id")).as("r_tag")))
      val left = s.range(probes)
        .select(col("id").as("l_id"),
          timestamp_micros(lit(5200000L) + col("id") * 11000L).as("l_ts"))
      val joined = graft.operators.IntervalJoin
        .binnedTimePairs(left, "l_ts", right, "r_ts", tolUs)
      val t0 = System.nanoTime()
      val pairs = joined.count()
      ((System.nanoTime() - t0) / 1e9, pairs)
    }

    // warm both paths once (codegen/JIT), then measure
    run(skewOn = true); run(skewOn = false)
    val (tOn, pairsOn) = run(skewOn = true)
    val (tOff, pairsOff) = run(skewOn = false)
    require(pairsOn == pairsOff, s"pair counts diverged: $pairsOn vs $pairsOff")
    def r3(v: Double) = math.rint(v * 1000) / 1000
    println(s"""{"burst_rows":$n,"probes":$probes,"aqe_on_sec":${r3(tOn)},"aqe_off_sec":${r3(tOff)},"pairs":$pairsOn,"speedup":${r3(tOff / tOn)}}""")
    root.stop()
  }
}
