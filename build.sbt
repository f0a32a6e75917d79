ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "doeecommerce_datapipelinespark"
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
// Forked run output goes RAW to stdout (no "[info] " logger prefix):
// the driver parses Bench's one-line JSON from the tail of stdout, and
// a logger prefix would break json.loads on that line.
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
  // local[32] runs 32 concurrent tasks in ONE JVM: unified execution +
  // storage memory is 0.6×(heap−300M), so an 8g heap gives each task
  // ~145 MB — persisted LSH bucket tables and checkpoint blocks then
  // thrash GC and spill (measured 4-10× per-query blowups). The box has
  // 128 GiB; give the worker JVM a heap sized like a real executor.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // A 200-query suite JIT-compiles thousands of unique whole-stage-
  // codegen classes (each query × each retime generates fresh ones);
  // at the JVM's default ~240 MB code cache the sweeper starts
  // evicting hot methods and late queries re-run interpreted-to-
  // rewarmed — part of the measured in-suite slowdown (q145: 28.7 s
  // at suite position ~140 vs 15.9 s in a fresh JVM, same box/load).
  "-XX:ReservedCodeCacheSize=1g",
)
