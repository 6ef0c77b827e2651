ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "accidentpredictionmontrealspark"
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
// Forked `run` output normally goes through sbt's logger, which prefixes
// every line with "[info] " — that corrupts the one-line JSON contract of
// graft.Bench (the harness json-parses the stdout tail). Inherit stdout
// so program output reaches the console raw.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop the trailing "[success] Total time: ..." logger line so the
// JSON summary is the literal last line of stdout.
Global / showSuccess := false
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
  // 32g default (machine has 128g): at 8g the MEMORY_AND_DISK persists
  // of the heavy dedup/geo queries fought execution memory for the
  // ~5 GB unified region and evicted each other — the round-7 driver
  // bench measured the SAME code 2-6x slower than an idle local run
  // purely from that eviction churn (trivial queries matched to the ms,
  // persist-heavy ones blew up: densify-rematch 4.6s -> 25s).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
