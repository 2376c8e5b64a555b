ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "velesdbspark"
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
)

// Forward stdin to forked `run` JVMs so graft.cli.Repl reads its
// input (interactive or piped); no effect on the other mains.
run / connectInput := true

// Driver contract: the bench's ONE JSON line must be the literal last
// line of stdout. The default LoggedOutput strategy wraps the forked
// process's stdout in `[info] ` prefixes and sbt appends a
// `[success] Total time: ...` trailer — BENCH_r16/r17 both recorded
// parsed:null because the driver's parser never saw a bare-JSON last
// line. StdoutOutput passes the forked JVM's stdout through verbatim
// (stderr stays on stderr, so Spark WARN chatter cannot land after the
// JSON line), and showSuccess:=false drops the trailer.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by the command layer, not a task — exclude it
// from sbt's unused-key lint so builds stay warning-free
Global / excludeLintKeys += showSuccess
