ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bearystaspark"
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
// Bench/Verify print ONE machine-readable JSON line on stdout; sbt's
// default LoggedOutput for forked runs prefixes every line with
// "[info] ", which has broken the driver's BENCH_r0N.json parse three
// rounds running. StdoutOutput passes the child's stdout through
// verbatim, so the JSON line lands bare.
outputStrategy := Some(StdoutOutput)
// The driver keeps only the LAST 2000 bytes of the run's output; sbt's
// "[success] Total time: ..." epilogue (~74 bytes) printed AFTER the
// bench's one-line JSON artifact was eating that budget from the tail
// end while the 175-query artifact grew from the head end. Suppress
// the epilogue so the whole capture window belongs to the artifact.
showSuccess := false
showTiming := false
// both keys are command-consumed, which sbt's unused-setting lint
// can't see — exclude them so the warning doesn't precede every run
Global / excludeLintKeys ++= Set(showSuccess, showTiming)
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
  "-XX:ReservedCodeCacheSize=1g", "-XX:+UseCodeCacheFlushing",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
