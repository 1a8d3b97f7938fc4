ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "entity_resolutionspark"
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
// Forked-run stdout must reach the driver verbatim: sbt's default logger
// prefixes every line with "[info] ", which made BENCH_r01.json
// machine-unreadable ("parsed": null). StdoutOutput pipes the forked
// JVM's stdout straight through.
run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // batch throughput beats G1's pause targets here: scoring is
  // allocation-heavy and STW GC time is the main non-scaling (serial)
  // term in the local[8]-vs-local[32] comparison
  "-XX:+UseParallelGC",
)
// ad-hoc JVM flags for perf diagnosis (e.g. -Xlog:gc, GC A/B) — appended
// LAST so they can override the defaults above
javaOptions ++= sys.env.get("GRAFT_EXTRA_JAVA_OPTS").toSeq
  .flatMap(_.split(" ").filter(_.nonEmpty))
