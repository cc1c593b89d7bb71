ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pidbrdfspark"
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
// forked runMain output goes straight to stdout (no "[info] " log
// prefix): Bench/Verify print one machine-parsed JSON line, and the
// prefixed form broke the driver's parser every round (BENCH_r* had
// "parsed": null since r1)
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
// extra -D flags for forked runs (e.g. soaks forcing a gate branch:
// SPARK_GRAFT_JAVA_OPTS="-Dgraft.describe.broadcast.max=1")
javaOptions ++= sys.env.get("SPARK_GRAFT_JAVA_OPTS")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 32 executor threads + the persisted triple store want headroom;
  // 16g showed 3x run-to-run GC variance on string-heavy queries
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
