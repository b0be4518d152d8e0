ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vechordspark"
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
// Let the forked run JVM write straight to this process's stdout: sbt's
// default logger prefixes every line with "[info] ", which breaks any
// consumer expecting the Bench contract's bare one-line JSON metric.
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
  // The generated-class cache (default 100 entries) thrashes in any
  // long-lived driver running many distinct query shapes — here, a
  // 264-query suite recompiles essentially every WholeStageCodegen
  // span on every pass (janino ~20-50 ms per class). 8192 entries is
  // a few hundred MB of metaspace at worst and is scale-independent
  // (the same driver behavior at any data size). Measured: -11% warm
  // on a 12-query mixed slice, uniform across families.
  "-Dspark.sql.codegen.cache.maxEntries=8192",
  // measured: 8g beats larger heaps here (cold-page + GC ergonomics;
  // persisted caches spill via MEMORY_AND_DISK under pressure)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
