ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "plfuzzyframematchspark"
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
// Forked run/runMain output goes STRAIGHT to stdout instead of through
// sbt's logger: the round driver parses the bench harness's final stdout
// line as bare JSON, and the logger's "[info] " prefix broke that parse
// four rounds running (VERDICT r12-r15). showSuccess drops the trailing
// "[success] Total time..." banner for the same reason — with both set,
// the last stdout line of `sbt "runMain graft.Bench"` is the compact
// JSON record itself. Exit codes (what `sbt test` gates on) unchanged.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, which the unused-key
// lint cannot see
Global / excludeLintKeys += showSuccess
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
  // 12g default (was 8g): a full 24-row bench run accumulates localCheckpoint
  // blocks across rows (released asynchronously by the ContextCleaner), and
  // one observed sf1-tier sample failed its ~128 MB broadcast build under
  // that pressure at 8g ("Not enough memory to build and broadcast",
  // GCLocker retry warnings). The box has 128 GiB; 12g keeps the forked
  // JVM comfortably clear while SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // Defensive headroom for generated-code-heavy suites: a full JIT code
  // cache silently disables compilation. Measured occupancy here is only
  // ~104 MB of the 240 MB default (eviction was investigated for the r11
  // cold-sample anomaly and REFUTED — Bench.codeCacheMb, SCALE.md
  // "Cold-first-sample anomaly"), so this is insurance, not a fix;
  // reserve != commit, the headroom costs address space only.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_GRAFT_CODECACHE", "1g")}",
)
