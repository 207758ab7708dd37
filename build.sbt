ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "maanonymizationetlspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and json-parses the stdout
// TAIL. Two things in sbt's default logging defeat that parse: (a) forked
// process output is routed through the logger as "[info] <line>", so the
// contractual summary line is never valid JSON, and (b) sbt appends a
// "[success] Total time: ..." line AFTER it. StdoutOutput passes the forked
// JVM's stdout through raw (no [info] prefix); showSuccess drops the
// trailing [success] line, making Bench's summary the last stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
// tmpfs for shuffle files and the source/sink roundtrip queries — removes
// VM-disk fsync stalls from per-query timings (126 GB /dev/shm, scratch
// usage is a few hundred MB). Hosts without /dev/shm fall back to the
// default tmpdir (GRAFT_SCRATCH overrides either way).
val graftScratch: Option[String] =
  sys.env.get("GRAFT_SCRATCH").orElse(
    if (new java.io.File("/dev/shm").isDirectory) Some("/dev/shm") else None)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 80 queries of whole-stage-codegen classes overflow the default 240 MB
  // JIT code cache; once full, late queries run interpreted (rotating
  // multi-second slowdowns in Bench)
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+ExplicitGCInvokesConcurrent",
) ++ graftScratch.toSeq.flatMap(s => Seq(
  s"-Dspark.local.dir=$s/graft_spark_local",
  s"-Djava.io.tmpdir=$s/graft_tmp",
))

// the forked JVM needs the tmpdir to exist before JVM startup
Global / onLoad := {
  val prev = (Global / onLoad).value
  graftScratch.foreach { s =>
    new java.io.File(s, "graft_tmp").mkdirs()
    new java.io.File(s, "graft_spark_local").mkdirs()
  }
  prev
}
