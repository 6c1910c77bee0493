ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "federatedgcnspark"
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
// Stream the forked app's stdout DIRECTLY (no "[info] " logger prefix):
// the driver keeps a ~2 KB stdout tail of `runMain graft.Bench` and
// json-parses the final line — the sbt logger prefix has made that
// parse fail every round (BENCH_r*.json "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress the trailing "[success] Total time..." logger line,
// which otherwise lands AFTER the JSON as the tail's final line.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // used by the command layer, not a task
// Diagnostic mains (Probe*/Soak*/Parity/PlanAudit) live outside the
// library source set: they compile with the TEST configuration — kept
// healthy by every `sbt test` cycle, runnable via
// `sbt "Test/runMain graft.tools.ProbeAnalyze"` — but never ship in
// the library jar and never count as product code.
Test / unmanagedSourceDirectories += baseDirectory.value / "probes"
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
  // dev.ludovic.netlib picks its SIMD VectorBLAS (~4x Java11BLAS dgemm
  // here) when the vector module is present; harmless incubator warning.
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default (r18): local[N] runs N task slots inside this one JVM,
  // and the 8g default left 32-slot runs at ~250 MB/slot — below
  // Spark's per-core guidance once the bench's persisted layouts and
  // localCheckpoints compete with execution memory. At 8g the full
  // sf0.1 bench showed 2-10x per-pass swings (q104 36/54/6 s across
  // interleaved passes) that vanish at 16g (183.6/189.5/188.6 s pass
  // totals, no query slower); still env-overridable per box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
