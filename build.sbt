ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreducesubnetspark"
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
// The 52 suites take ~45 min sequentially in one JVM — past the driver's
// test-capture window (VERIFY_r17 ended mid-stream with no summary).
// Fork the suites into parallel groups, each with its OWN java.io.tmpdir:
// the store-lifecycle fixtures are tmpdir-keyed and marker-gated but not
// cross-process locked, so two JVMs sharing /tmp could race one fixture
// build. Round-robin by suite name spreads the heavy store suites.
val testGroupCount = 6
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val baseOpts = (Test / javaOptions).value.toVector
  tests.zipWithIndex.groupBy(_._2 % testGroupCount).toSeq.sortBy(_._1).map {
    case (i, ts) =>
      // short name: scan Location strings truncate at 100 chars, and
      // PlanShapeSpec asserts on path SUFFIXES (…-incr) — a longer
      // tmpdir prefix pushes them past the cut
      val tmp = file(s"/tmp/gtg$i")
      IO.createDirectory(tmp)
      Tests.Group(s"group-$i", ts.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(
          baseOpts :+ s"-Djava.io.tmpdir=${tmp.getAbsolutePath}")))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount), Tags.limitAll(16))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The 43-query inventory JIT-compiles hundreds of codegen'd classes;
  // the default 240m code cache fills mid-run, silently disabling the
  // JIT (bench total 84s vs 34s).
  "-XX:ReservedCodeCacheSize=1g",
)
