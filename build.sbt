ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "redisgraphspark"
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
// Pass forked-run stdout straight through (no "[info] " prefix) so the
// bench/verify JSON lines are machine-parseable by the calling harness.
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
  // 16g: the enforced TCK corpus (2200+ scenarios incl. the promoted
  // temporal set, 8 concurrent workers sharing one local SparkContext)
  // peaks past 8g on codegen + concurrent scenario graphs
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // A long bench/test session generates hundreds of janino classes (one
  // per distinct plan shape); the JDK17 default 240m code cache fills and
  // HotSpot stops compiling — codegen'd loops then run INTERPRETED, which
  // showed up as the 5x cold-run bistability on q_dedup_minhash in rounds
  // 6-8. 512m keeps the whole session's nmethods resident. On a real
  // cluster this is a spark.executor.extraJavaOptions setting.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
) ++ (
  // CODEGEN_STRICT=1: make any codegen compile failure FATAL instead of
  // silently falling back to interpreted execution — attribution runs for
  // hunting fallback-causing plan shapes (a fallback is a perf bug at
  // scale: the plan loses whole-stage codegen exactly on the hot path).
  if (sys.env.get("CODEGEN_STRICT").contains("1"))
    Seq("-Dspark.sql.codegen.factoryMode=CODEGEN_ONLY",
      "-Dspark.sql.codegen.fallback=false")
  else Seq.empty
)
