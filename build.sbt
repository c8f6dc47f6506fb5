ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "frizzlespark"
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
// The driver machine-parses `runMain graft.Bench` stdout for ONE JSON
// line. sbt's default LoggedOutput prefixes every forked-run line with
// "[info] " and appends a "[success] Total time" line, both of which
// defeat a last-line JSON parse (BENCH_r01–r04 all record parsed:null).
// Pass run output through raw and suppress the success banner.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not another setting —
// exclude it from the unused-key lint.
Global / excludeLintKeys += showSuccess
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
  // testdata events.ts is parquet timestamp[ns]; Spark must read it as long
  "-Dspark.sql.legacy.parquet.nanosAsLong=true",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ---- parallel test groups (r22) ----
// One forked JVM runs every suite sequentially on a local[4] session —
// measured 28 min wall on an idle 32-core box, and the r21 driver's test
// run was cut off mid-suite on a loaded one (VERIFY_r21 tests_ok:false).
// Suites are grouped into N forked JVMs running in PARALLEL: each group
// keeps its own SparkContext/warehouse/tmp (full isolation — suites that
// pin job counts, mutate session conf, or saveAsTable never share a JVM
// with a concurrent suite), so within-group behavior is identical to the
// old single-JVM run. Group assignment is deterministic greedy
// bin-packing by measured suite seconds (unknown suites get a nominal
// weight), so the critical path is the heaviest suite, not the sum.
val testGroupCount = 4
val suiteWeights: Map[String, Int] = Map(
  "graft.DeterminismSpec" -> 290, "graft.PlanAuditSpec" -> 98,
  "graft.BusSpec" -> 85, "graft.StreamingWindowSpec" -> 54,
  "graft.PropertySpec" -> 48, "graft.PipelineSpec" -> 40,
  "graft.SimilaritySpec" -> 37, "graft.DedupSpec" -> 35,
  "graft.ScaleSpec" -> 30, "graft.StreamingTypeCorrSpec" -> 28,
  "graft.StreamingJoinSpec" -> 26, "graft.StreamingPeriodSpec" -> 22,
  "graft.BpeSpec" -> 21, "graft.DataGenSpec" -> 21,
  "graft.StreamingAttributionSpec" -> 21)
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(t => (-suiteWeights.getOrElse(t.name, 10), t.name))
  val opts = (Test / forkOptions).value
  val bins = Array.fill(testGroupCount)(0L)
  val groups = Array.fill(testGroupCount)(List.newBuilder[sbt.TestDefinition])
  tests.foreach { t =>
    val i = bins.indices.minBy(bins(_))
    bins(i) += suiteWeights.getOrElse(t.name, 10).toLong
    groups(i) += t
  }
  groups.zipWithIndex.map { case (g, i) =>
    Tests.Group(s"g$i", g.result(), Tests.SubProcess(opts))
  }.toSeq
}
// sbt's default restriction runs forked test groups one at a time; allow
// them to actually overlap (bounded by the group count).
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(4, java.lang.Runtime.getRuntime.availableProcessors())),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.exclusiveGroup(Tags.Clean),
)
