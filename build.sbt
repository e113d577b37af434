ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tugas2bigdataspark"
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
// Pipe the forked run's stdout straight through instead of re-logging it
// with an "[info] " prefix: the round driver parses the tail of stdout as
// JSON (graft.Bench's compact line), and the prefix/levelling breaks that.
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
  // 32 executor threads share the unified memory region of this one
  // JVM: at 8g (≈4.5g unified) the sf0.1 LSH self-joins spill, and
  // spill pressure is where the in-suite bench variance came from
  // (measured round 5: heavy-family mini-suite 39.6 s @8g vs 33.9 s
  // @32g, with per-query spreads tightening to ≤1.5×). The box has
  // 128 GiB; size the single-JVM "cluster" like the real one.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // ~130 whole-stage-codegen'd plans × several reps fill the default
  // 240m JIT code cache; once full, newly-generated query classes run
  // interpreted until the sweeper frees space — measured as one heavy
  // query per suite run drawing a 10x sample (121 s / 134 s for the
  // same ~10 s query in two round-5 runs) while all neighbors stayed
  // flat. 512m keeps every plan compiled.
  "-XX:ReservedCodeCacheSize=512m",
) ++ sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
