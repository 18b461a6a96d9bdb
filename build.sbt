ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlenergytrackerspark"
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
// Scratch space on tmpfs when the host has one: e2e fixtures, streaming
// checkpoints and Spark's shuffle/spill files (spark.local.dir defaults
// under java.io.tmpdir) are all throwaway, and /tmp on this image is
// ext4 — every state-store commit and fixture write pays a real-disk
// fsync there. Purely a local-harness knob: a production cluster sets
// spark.local.dir itself.
val scratchDir: Option[String] = {
  val shm = new java.io.File("/dev/shm")
  if (shm.isDirectory && shm.canWrite) {
    val d = new java.io.File(shm, "graft-tmp")
    d.mkdirs()
    Some(d.getAbsolutePath)
  } else None
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // G1's concurrent machinery thrashes with 32 allocation-heavy task
  // threads on small-SF workloads (measured 3-10x wall-time inflation on
  // local[32]); throughput GC restores linear scaling
  "-XX:+UseParallelGC",
  // local mode = one JVM holding driver AND all 32 executor threads; on
  // this 128 GiB box a roomy heap keeps ParallelGC full collections rare
  // under the bench's allocation bursts
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ scratchDir.toSeq.flatMap(d =>
  Seq(s"-Djava.io.tmpdir=$d", s"-Dspark.local.dir=$d"))
