ThisBuild / scalaVersion := "2.13.17"
ThisBuild / scalacOptions += "-deprecation"
ThisBuild / version := "0.1.0"
name := "queryprocessingoverstreamingdatausingflinkspark"
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
// Pass forked-run output straight through to this process's stdout/stderr
// instead of routing it through sbt's logger — the bench driver parses the
// one-line JSON result from stdout, and sbt's "[info] " prefix breaks that.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
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
) ++
// forward engine knobs (-Dgraft.*: compact.every, simhash.chunks, strict)
// from the sbt JVM into the forked run/test JVMs
sys.props.toSeq.collect { case (k, v) if k.startsWith("graft.") => s"-D$k=$v" } ++ Seq(
  // local[32] puts all executor threads in this one JVM: an 8g heap GC-
  // thrashes under 32-way shuffles (and adds big run-to-run variance)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Tests run the incremental stream in strict mode: invariant violations
// (e.g. a malformed changelog leaving revenue residue in a zero-count
// group) fail loudly instead of being silently compacted away.
Test / javaOptions += "-Dgraft.strict=true"
// If the forked test JVM ever crashes natively, keep the evidence
Test / javaOptions += "-XX:ErrorFile=/tmp/hs_err_graft_%p.log"
// Suites share one SparkSession (and temp views via registerAll) — run
// them sequentially to avoid catalog races.
Test / parallelExecution := false
