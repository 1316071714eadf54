ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "marketdataingestionscraperspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver machine-parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. sbt's trailing "[success] Total time: …" chrome printed after the
// forked JVM exits broke that parse for three rounds — suppress it, and drop
// run-task [info] chrome ("running graft.Bench …") to warnings-only so the
// bench's own JSON is the genuinely final line.
ThisBuild / showSuccess := false
// Route the forked JVM's stdio straight through (no "[info] " logger
// prefix on every line): the JSON must be byte-identical on stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] runs 32 concurrent tasks in one JVM; 8g was enough to finish
  // but put heavy queries into GC storms (30x blowups in round 1's bench).
  // The box has 125 GiB — give the forked JVM real headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // ~75 queries x several codegen units: the default 240m JIT code cache
  // fills mid-bench and compilation stops (interpreted generated code)
  "-XX:ReservedCodeCacheSize=512m",
)
