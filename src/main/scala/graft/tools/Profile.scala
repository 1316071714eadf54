package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Ad-hoc per-query profiler: `runMain graft.tools.Profile <sfDir> <prefix...>`
  * runs every declared query whose name starts with one of the prefixes,
  * N times each (SPARK_GRAFT_PROFILE_RUNS, default 2 — first run shows the
  * cold cost, later runs the steady state), printing per-run seconds.
  * SPARK_GRAFT_PROFILE_EXPLAIN=1 additionally dumps the formatted physical
  * plan — the `.explain` audit loop the bench itself is too coarse for.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val prefixes = args.drop(1)
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    val doExplain = sys.env.get("SPARK_GRAFT_PROFILE_EXPLAIN").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // an engine with ~75 distinct query plans overflows the default
      // 100-entry generated-class cache every sweep, recompiling the
      // heaviest codegen units (seconds each) on every run
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .appName("graft-profile").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picked = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.isEmpty || prefixes.exists(n.startsWith) }
    for ((name, fn) <- picked) {
      if (doExplain) fn(spark, sfDir).explain("formatted")
      val times = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val cnt = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, cnt)
      }
      val ts = times.map(t => f"${t._1}%.2f").mkString(" ")
      println(f"PROFILE $name%-28s rows=${times.head._2}%-8d $ts")
    }
    spark.stop()
  }
}
