ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "stanford_respark"
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
// Pass the forked app's stdout through UNPREFIXED: the bench contract is
// ONE bare JSON line on stdout, and sbt's default LoggedOutput prepends
// "[info] " to every line, which breaks machine parsing of that line.
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
  // shuffle/spill on tmpfs: the sandbox's virtual disk serializes
  // concurrent shuffle I/O (125 GiB RAM available)
  "-Dspark.local.dir=/dev/shm/graft-spark",
  // This sandbox VM demand-pages guest memory through a serialized host
  // fault path (~77 MiB/s once warm memory is exhausted): any heap GROWTH
  // mid-job stalls all 32 executor threads. Fix the heap size and
  // pre-touch it once at JVM start so no page is ever faulted mid-stage.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+AlwaysPreTouch",
  // r6 (guide §2.2 "let AQE coalesce small partitions"): allow AQE to
  // re-plan CACHED plan fragments too, including their output
  // partitioning. The linker persists its alias-pair table (consumed by
  // count + collect); without this flag the cached plan's final shuffle
  // is exempt from AQE coalescing and keeps all spark.sql.shuffle
  // .partitions tasks even when the pair table is tiny or empty —
  // measured as a fixed ~0.15 s 32-empty-task stage inside every
  // kg_pipeline run at bench scale. Scale-independent: at real pair
  // volumes AQE coalesces to advisoryPartitionSizeInBytes instead of
  // dropping to one task, which is the production-correct layout.
  "-Dspark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true",
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc:file=$f").toSeq ++ Seq(
)
