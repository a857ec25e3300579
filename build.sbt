ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pdf_extractorspark"
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
  // local[32] = 32 executor threads in ONE driver JVM; an 8g heap made
  // the string-heavy extraction kernel GC-bound at high thread counts
  // (the box has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // throughput GC for the batch workload; G1's pause targeting costs
  // ~10-20% at 32 allocation-heavy threads
  s"-XX:+${sys.env.getOrElse("SPARK_GC", "UseParallelGC")}",
  // Take the PRODUCTION shuffle-writer path. The session pins
  // spark.sql.shuffle.partitions to the core count, which lands under
  // the bypass-merge threshold (200): BypassMergeSortShuffleWriter
  // then opens+merges one temp file PER REDUCER PER MAP TASK (~66
  // file ops/task on this VM's virtio disk ≈ 0.1-0.2 s/task, measured
  // as the dominant cost of every small exchange). Real deployments
  // run thousands of reduce partitions and never take the bypass
  // path; forcing the sort writer (one spill file per task) makes
  // local execution use the same code path production does.
  "-Dspark.shuffle.sort.bypassMergeThreshold=2",
  // Shuffle/spill scratch on tmpfs — the local analog of the NVMe
  // scratch disks cluster nodes mount for shuffle; this VM's /tmp is
  // a virtio disk with ~ms file-op latency that dwarfs the actual
  // bytes written at bench scale. Overridable (SPARK_SCRATCH_DIR) and
  // falls back to java.io.tmpdir on hosts without a usable /dev/shm
  // (e.g. Docker's default 64 MB shm) — tmpfs spills are RAM-backed,
  // so a small-memory host should point this at a real disk.
  s"-Dspark.local.dir=${sys.env.getOrElse("SPARK_SCRATCH_DIR",
    if (new java.io.File("/dev/shm").isDirectory &&
        new java.io.File("/dev/shm").getUsableSpace > 8L * 1024 * 1024 * 1024)
      "/dev/shm/spark-local"
    else sys.props("java.io.tmpdir"))}",
)
