ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "petasearchspark"
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
// The round driver parses the LAST stdout lines of `sbt "runMain
// graft.Bench"`; sbt's "[success] Total time ..." banner otherwise prints
// after the program's final JSON line and breaks that parse (BENCH parsed:
// null, rounds 9-12). Exit codes still signal failure; ScalaTest still
// prints its own "All tests passed." summary.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// ... and the forked program's stdout must reach sbt's stdout RAW: the
// default LoggedOutput strategy prefixes every program line with
// "[info] ", which un-JSONs the bench line just as thoroughly as the
// success banner did. StdoutOutput passes the child's stdout through.
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
  // 24g default: the bench session runs 41 queries whose shingle/corpus
  // caches accumulate (local-mode storage memory comes out of this heap);
  // at 8g the caches evict mid-suite and every pass recomputes them.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
