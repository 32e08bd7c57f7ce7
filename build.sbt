ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "indri55spark"
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
// local-cluster[n,cores,mem] (multi-executor-JVM bench mode) needs these
// to launch executor processes from the driver JVM
run / envVars ++= Map(
  "SPARK_HOME" -> "/opt/spark",
  "SPARK_SCALA_VERSION" -> "2.13",
  // standalone workers ignore spark.local.dir; the env var is the only
  // way to put executor shuffle dirs on tmpfs (cluster-local-disk stand-in)
  "SPARK_LOCAL_DIRS" -> "/dev/shm/spark-local",
)
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
  // default driver/executor heap for local[N] runs: 32 task threads plus
  // the per-sf-dir index caches (3 positional index builds persist across
  // the 145-query surface) need ~1 GiB/core-class headroom — the old 8g
  // default left a 4.1 GiB unified pool that thrashed storage eviction and
  // GC once the cache set exceeded it (exploding per-rep times on the
  // iterative queries). Production-equivalent sizing, not a local[32]
  // special: any real executor gets 4-8 GiB/core. SPARK_DRIVER_MEM still
  // overrides (e.g. 48g for the 2M-doc SIM/EXTENT phases).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // throughput GC: local[32] runs 32 task threads in ONE JVM; G1's
  // concurrent cycles throttle allocation-heavy tokenize/shuffle stages
  "-XX:+UseParallelGC",
)
