ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "caligraphspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one SparkSession; BucketedJoinSpec toggles session confs —
// run suites sequentially so conf changes can't race across suites
Test / parallelExecution := false
run / fork := true
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
  // NOTE on the former .jvmopts flags (periodicGC.interval=30s and
  // coalescePartitions.minPartitionNum=8): -D flags in .jvmopts reach only
  // the sbt launcher JVM — sbt forks run/test JVMs with javaOptions alone,
  // so those settings never applied to any bench (verified empirically:
  // System.getProperty returned null in the forked JVM). Re-tested HERE,
  // where they DO apply, both measured worse and were dropped: the AQE
  // floor cost the ED pipeline 49.4 vs 42.4 s and f7_table_grid 5.58 vs
  // 4.79 s warm; periodic GC (a forced full GC every 30 s) cost the query
  // total 85.3/87.1 vs 78.5/83.6 s over two paired full-bench A/Bs.
  // throughput GC: steadier task times than G1 for allocation-heavy
  // parse/shuffle work in local mode (measured on Bench's scaling job)
  "-XX:+UseParallelGC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
