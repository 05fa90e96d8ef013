ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fdfspark"
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
// The driver parses Bench's one-line JSON from sbt stdout. With the
// default LoggedOutput strategy every forked-process line is prefixed
// "[info] ", which broke the round-1 parse (BENCH_r01.json parsed:null).
// StdoutOutput passes the forked JVM's stdout/stderr through verbatim.
outputStrategy := Some(StdoutOutput)
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
  // Fixed, pre-touched heap: on this VM an adaptive G1 young gen grew
  // into cold (never-faulted) memory and young collections took seconds
  // (measured YGCT 3-5 s/collection at 28g) — pre-touching and capping
  // the heap keeps GC pauses in the millisecond range and removes the
  // 4-30x run-to-run variance it caused.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "10g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "10g")}",
  "-XX:+AlwaysPreTouch",
  // Spark's per-query generated classes fill the default 240 MB code
  // cache over a long run; once full the JIT disables itself and
  // everything drops to interpreter speed.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
