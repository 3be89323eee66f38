ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fireboltcdclambdaspark"
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
// Forked `run` output must reach stdout verbatim: sbt's default
// LoggedOutput prefixes every line with "[info] ", which breaks any
// machine parser reading the Bench/Verify summary lines.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Scratch (temp catalogs, Spark local dirs) on tmpfs when a big one is
// mounted: isolates bench figures from disk write epochs — measured on
// d19 (temp-catalog heavy): median 4.10→3.67 s and max run 4.52→3.96
// with /dev/shm vs /dev/vda-backed /tmp; pure-compute queries unmoved.
// Guarded on ≥32 GiB usable so a small shm mount never fills. The
// Bench/Verify mains sweep stale run dirs, so tmpfs RAM is reclaimed
// even after a SIGKILLed run.
javaOptions ++= {
  val shm = file("/dev/shm")
  if (shm.isDirectory && shm.canWrite
      && shm.getUsableSpace > 32L * 1024 * 1024 * 1024) {
    val d = file("/dev/shm/graft-tmp"); d.mkdirs()
    Seq(s"-Djava.io.tmpdir=${d.getAbsolutePath}")
  } else Seq.empty
}
