ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rwa_calculatorspark"
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
// Pass the forked app's stdout straight through (no "[info] " prefix):
// the bench driver json-parses graft.Bench's single metric line from the
// tail of the sbt output, and sbt's log-prefixed relay breaks that.
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
  // 16g default: the bench runs ~50 queries x 3 executions in one JVM;
  // at 8g the later queries pay heavy old-gen GC (machine has 128 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)

// ---- parallel test groups -------------------------------------------------
// The suite estate is ~50 min wall when all ~62 suites run sequentially in
// one forked local[4] JVM (round-19 driver run: ~85 min under host
// contention, over the verify budget — tests_ok:false). Three suites own
// ~72% of it (SupervisoryValidationSpec 1127 s, CrmSubstitutionSpec 523 s,
// ReportingGoldenSpec 474 s, measured 2026-08-18 with ScalaTest -oD).
// Partition the suites into four forked JVMs run CONCURRENTLY — same
// suites, same assertions, each group sequential inside its own JVM (so no
// shared SparkContext and no intra-JVM races); wall becomes max(group)
// ≈ the SupervisoryValidationSpec group. Suites that execute the
// q180/q181/q182 ndjson queries share fixed per-sfDir tmp paths and are
// kept in ONE group (the catch-all) so they never race across JVMs.
// 4 JVMs x Xmx16g and 4 x local[4] fit the 128 GiB / 32-core sandbox.
val testGroupOf: String => Int = {
  case "graft.acceptance.SupervisoryValidationCrrSpec" => 0
  case "graft.acceptance.SupervisoryValidationB31Spec" => 1
  case "graft.acceptance.CrmSubstitutionSpec" |
       "graft.refbook.CellRederivationSpec" => 2
  case "graft.acceptance.ReportingGoldenSpec" |
       "graft.refbook.RefBookPlanSpec" => 3
  case n if n.startsWith("graft.acceptance.") ||
            n.startsWith("graft.refbook.") ||
            n.startsWith("graft.api.") ||
            n.startsWith("graft.engine.") => 4
  case _ => 5 // queries/operators/sources/functions/streaming/... + root
}
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  tests.groupBy(t => testGroupOf(t.name)).toSeq.sortBy(_._1).map {
    case (g, ts) => Tests.Group(s"group-$g", ts,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(10))
