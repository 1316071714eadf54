package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Machine-level yardsticks for normalizing bench drift ACROSS rounds.
  *
  * Round 6's verdict flagged the iterative dedup/graph family drifting
  * 1.3-1.8x against round 5 on unchanged code and unchanged plans.
  * Round 7's isolated idle-box reruns reproduced the shift on CONTROL
  * queries too (single-agg scans drifted 1.05-1.46x), with the drift
  * magnitude tracking the number of stages a query runs — i.e. the
  * environment (VM placement, host contention, CPU frequency) moved, not
  * the engine. This probe pins that explanation to reproducible numbers:
  * run it on an idle box next to any bench record, and compare ratios of
  * the three components rather than eyeballing per-query wall times.
  *
  * Components, each the dominant cost of one query family:
  *   cpu_st_sec     - single-thread integer/FP loop (fixed work): tracks
  *                    per-core speed, the floor under every short stage.
  *                    Iterative queries (d16/d22: 20+ stages of tiny
  *                    joins) are ~pure multiples of this + stage_sec.
  *   stage_sec      - wall seconds per empty-ish shuffle stage, measured
  *                    over 24 consecutive tiny repartition+agg rounds:
  *                    scheduler/task-launch/shuffle-manager fixed cost.
  *   scan_mb_per_s  - parquet scan+agg throughput on one big column
  *                    (decompress + decode + sum): tracks the IO/codegen
  *                    side that single-pass queries (q01/q04/t04) ride.
  *
  * Prints ONE JSON line (the Bench discipline). Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.EnvProbe"
  */
object EnvProbe {

  /** The stage-cost yardstick (seconds per empty shuffle stage) for
    * Bench's in-record normalization. METHODOLOGY MATTERS: a probe inside
    * a fully-warmed bench session reads ~0.05 s/stage where a standalone
    * EnvProbe run on the same quiet box reads ~0.088 (cold shuffle
    * machinery) — the two are not comparable. This constant is the
    * WARM-SESSION value measured on the quietest observed window
    * (round 9's post-sweep probe on a settled box, corroborated across
    * two runs); Bench's brackets run at the same point in session
    * lifecycle, so `RefStageSec / measured` is apples-to-apples. The
    * historic standalone-probe idle yardstick 0.088 lives in BASELINE.md
    * for reading old records; never mix the two.
    */
  val RefStageSec: Double = 0.050

  /** (cpu_st_sec, stage_sec, scan_mb_per_s) on the given session — the
    * callable form Bench embeds before/after its timed sweeps.
    */
  def components(spark: SparkSession, sfDir: String): (Double, Double, Double) = {
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.length / 2)

    // 1) single-thread CPU: fixed mixed int/FP work, warmed then median-5
    def cpuLoop(): Double = {
      var acc = 0.0; var x = 123456789L
      var i = 0
      while (i < 200000000) {
        x = x * 6364136223846793005L + 1442695040888963407L
        acc += java.lang.Double.longBitsToDouble(
          (x & 0x000fffffffffffffL) | 0x3ff0000000000000L)
        i += 1
      }
      acc
    }
    cpuLoop(); cpuLoop()
    var sink = 0.0
    val cpuSt = med((1 to 5).map(_ => timed { sink += cpuLoop() }))
    require(!sink.isNaN) // keep the loop un-eliminable

    // 2) per-stage fixed overhead: 24 rounds of a tiny repartition+agg —
    // real shuffle machinery, negligible data (1k longs), so wall time is
    // ~24 x (schedule + launch + shuffle-write/read fixed cost)
    val tiny = spark.range(1000).toDF("v")
    def stages(): Unit = {
      var df = tiny
      for (_ <- 1 to 24)
        df = df.repartition(col("v")).agg(sum("v").as("v")).toDF("v")
      df.count()
    }
    stages() // warm codegen for the 24-deep plan
    val stageSec = med((1 to 3).map(_ => timed(stages()))) / 24.0

    // 3) parquet scan throughput: sum one numeric column of the largest
    // table (footer caches warmed by a first pass)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val bytes = new java.io.File(s"$sfDir/lineitem.parquet").listFiles() match {
      case null => new java.io.File(s"$sfDir/lineitem.parquet").length()
      case fs => fs.map(_.length()).sum
    }
    def scan(): Unit = { li.agg(sum("l_extendedprice")).collect(); () }
    scan()
    val scanSec = med((1 to 5).map(_ => timed(scan())))
    (cpuSt, stageSec, bytes / 1e6 / scanSec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (cpuSt, stageSec, mbps) = components(spark, sfDir)
    def r3(v: Double) = math.rint(v * 1000) / 1000
    println(s"""{"metric":"env_probe","cpu_st_sec":${r3(cpuSt)},"stage_sec":${r3(stageSec)},"scan_mb_per_s":${r3(mbps)},"cpus":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
