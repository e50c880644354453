ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "postgrescdcexamplespark"
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
// The round driver json-parses the bench line out of the LAST 2000
// chars of sbt's combined output. Two sbt decorations defeated that in
// rounds 1-6 even once the line fit the window: LoggedOutput prefixes
// every forked-process line with "[info] " (so the line never starts
// with '{'), and the "[success] Total time…" epilogue lands AFTER the
// line (so it is never last). StdoutOutput passes the forked JVM's
// stdout/stderr through verbatim; showSuccess removes the epilogue —
// the bench JSON becomes the literal, undecorated last line.
outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += outputStrategy
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
// 32 local executor threads share this single JVM heap: 8g showed G1
// pressure under concurrent shuffle/codegen load (BENCH_r03 regressions).
// Fixed Xms + AlwaysPreTouch: the whole heap is faulted in at startup,
// so steady-state jobs never pay the first-touch page-zeroing tax that
// otherwise lands on whatever runs minutes into the session.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc*:file=$f").toSeq
