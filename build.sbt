ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "novipdqetlprojectprodspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
  // embedded DB for JDBC sink integration tests (speaks ON CONFLICT,
  // like the Postgres the reference targets); test-only, from the
  // pre-warmed offline cache
  "org.duckdb" % "duckdb_jdbc" % "1.0.0" % Test,
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
scalacOptions ++= Seq("-deprecation")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Parallel forked test groups: suites are round-robined into N JVMs that
// run concurrently, each with its OWN SparkSession (SparkTestSession is
// per-JVM), so conf-mutating suites (ANSI mode, codegen factory mode,
// state-store provider) can never race another suite's queries — full
// process isolation, unlike in-JVM parallel suites. Every test still runs
// on plain `sbt test`; this only cuts wall time (~220 s serial → the
// slowest group). GRAFT_TEST_GROUPS=1 restores the serial single-JVM run.
val nTestGroups = sys.env.get("GRAFT_TEST_GROUPS").flatMap(s =>
  scala.util.Try(s.toInt).toOption).filter(_ > 0).getOrElse(6)
// per-test durations in the report (balancing data for the groups below)
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// measured suite wall times (seconds, from a -oD run) drive the LPT bin
// packing below; unlisted suites get a small default weight
val suiteWeights: Map[String, Double] = Map(
  // refreshed from a parallel -oD run (contention-skewed but
  // directionally right); streaming restart suites dominate
  "graft.DedupStreamSpec" -> 40, "graft.LlmSpec" -> 40,
  "graft.CurationSpec" -> 35, "graft.QuickstartSpec" -> 34,
  // PlanShapeSpec and ContractSpec sweep ALL contract queries; their
  // cost tracks the (now 200-query) surface, not their test count
  "graft.PlanShapeSpec" -> 220, "graft.ContractSpec" -> 200,
  "graft.PageRankSpec" -> 22,
  "graft.ScaleStressSpec" -> 20, "graft.SessionizeStreamSpec" -> 20,
  "graft.SetSimSpec" -> 28,
  "graft.RangeJoinSpec" -> 18, "graft.MlCrossCheckSpec" -> 15,
  "graft.AnsiModeSpec" -> 14, "graft.PropertySpec" -> 14,
  "graft.AnalyticsOpsSpec" -> 14, "graft.FunnelStreamSpec" -> 12,
  "graft.Scd2Spec" -> 12, "graft.PipelineSpec" -> 11,
  "graft.DqSpec" -> 11, "graft.RepetitionSpec" -> 10,
  "graft.AsOfSpec" -> 9, "graft.LayoutSpec" -> 9,
  "graft.DsvSpec" -> 9, "graft.RocksDbStateSpec" -> 8,
  "graft.BoilerplateSpec" -> 7, "graft.SinksSpec" -> 6,
  "graft.CastsSpec" -> 6,
  "graft.SequenceOpsSpec" -> 5, "graft.WindowsSaltSpec" -> 5,
  "graft.QuotaStreamSpec" -> 12, "graft.GraphSimSpec" -> 10,
  "graft.StreamJoinSpec" -> 5, "graft.StreamingSpec" -> 3,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  // LPT bin packing: heaviest suite first into the lightest bin
  val bins = Array.fill(nTestGroups)(
    (0.0, List.empty[sbt.TestDefinition]))
  tests.sortBy(t => -suiteWeights.getOrElse(t.name, 5.0)).foreach { t =>
    val i = bins.indices.minBy(j => bins(j)._1)
    bins(i) = (bins(i)._1 + suiteWeights.getOrElse(t.name, 5.0), t :: bins(i)._2)
  }
  bins.toSeq.zipWithIndex.collect { case ((_, ts), i) if ts.nonEmpty =>
    Tests.Group(s"g$i", ts.reverse, Tests.SubProcess(opts))
  }
}
// sbt's DEFAULT restrictions pin ForkedTestGroup to 1 (serial groups);
// replace the set wholesale so the groups genuinely run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors()),
  Tags.limit(Tags.ForkedTestGroup, nTestGroups),
  Tags.exclusive(Tags.Clean),
)
