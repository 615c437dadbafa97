ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkaworkersspark"
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
// The round driver parses the LAST stdout line of `runMain graft.Bench`
// as the metric JSON. Two sbt behaviors break that: the "[info] " prefix
// on forked-process output, and the trailing "[success] Total time..."
// epilogue. StdoutOutput pipes the forked JVM's stdout through verbatim,
// and showSuccess drops the epilogue — the metric line IS the last line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
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
// The master URL is a SparkContext-level choice (one context per JVM), so
// suites that can't run on the shared local[4] context get their own
// forked group: FaultToleranceSpec needs `local[N, maxFailures]` (task
// retries), LocalClusterSpec needs `local-cluster[...]` (real executor
// JVMs) plus SPARK_HOME/SPARK_SCALA_VERSION in the env for executor launch.
Test / testGrouping := {
  val forkOpts = ForkOptions().withRunJVMOptions(
    (Test / javaOptions).value.toVector)
  val clusterEnv = Map(
    "SPARK_HOME" -> (baseDirectory.value / "target" / "spark-home").getAbsolutePath,
    "SPARK_SCALA_VERSION" -> "2.13")
  val tests = (Test / definedTests).value
  def grp(name: String, pick: String => Boolean, env: Map[String, String]) =
    Tests.Group(name, tests.filter(t => pick(t.name)),
      Tests.SubProcess(forkOpts.withEnvVars(env)))
  Seq(
    grp("fault-tolerance", _.endsWith("FaultToleranceSpec"), Map.empty),
    grp("local-cluster", _.endsWith("LocalClusterSpec"), clusterEnv),
    grp("main", n => !n.endsWith("FaultToleranceSpec") &&
      !n.endsWith("LocalClusterSpec"), Map.empty),
  ).filter(_.tests.nonEmpty)
}
