ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreducegospark"
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
// The bench/verify harness parses raw stdout lines as JSON; sbt's default
// LoggedOutput prefixes every forked-process line with "[info] ", which
// breaks that parse. StdoutOutput passes the child's stdout through as-is.
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
  // profiling aid: SPARK_EVENTLOG=true dumps per-stage event logs
  s"-Dspark.eventLog.enabled=${sys.env.getOrElse("SPARK_EVENTLOG", "false")}",
  "-Dspark.eventLog.dir=file:///tmp/sparklogs",
  // local[32] shares one heap across all executor threads. Measured on
  // the MinHash pipeline at sf0.1 (cold, local[32]): 16g+G1 13s,
  // 16g+Parallel 18s, 48g+G1 25s, 48g+Parallel 100-196s — big heaps are
  // counterproductive on this virtualized host (page-fault storms show
  // up as GC time), so pin a moderate fixed-size heap.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  sys.env.getOrElse("SPARK_GC_FLAG", "-XX:+UseG1GC"),
)
