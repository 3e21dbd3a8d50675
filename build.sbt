ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pysparkpipeliningspark"
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
// Bench/Verify print ONE machine-parsed JSON line on stdout; sbt's
// default LoggedOutput for forked runs prefixes every line with
// "[info] ", which defeats a line-oriented json.loads (BENCH_r01–r03
// all record parsed:null). StdoutOutput inherits sbt's raw stdout —
// the JSON line reaches the driver unprefixed.
run / outputStrategy := Some(StdoutOutput)
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
  // local mode = driver-only JVM; the box has 128 GiB, size the heap
  // so sf0.1 joins/aggs never spill in the default configuration.
  // -Xms matches -Xmx: the first big shuffle/sort otherwise pays the
  // 1 GiB→tens-of-GiB heap-growth GC storm inside its measured time
  // (the round-9 scale probes clocked a ~100–300 s first-heavy-job
  // penalty that vanished on the second run)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // SPARK_GRAFT_XMS overrides the initial heap alone — the A/B knob
  // for measuring whether -Xms=-Xmx (motivated by the sf10 probes'
  // heap-growth GC storm) costs anything at sf0.1
  s"-Xms${sys.env.getOrElse("SPARK_GRAFT_XMS",
    sys.env.getOrElse("SPARK_DRIVER_MEM", "24g"))}",
  // codegen-heavy marathons (300 queries × whole-stage fragments)
  // fill the default 240 MB JIT code cache; once full, HotSpot stops
  // compiling and hot fragments run interpreted — a prime suspect for
  // the round-9 marathon-vs-isolated 4–6× gap. 512 MB is the
  // spark-docs-recommended headroom for codegen-heavy workloads.
  "-XX:ReservedCodeCacheSize=512m",
)
