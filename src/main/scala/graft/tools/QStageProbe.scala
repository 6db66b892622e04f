package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** r6 guide-§1/§7 probe: per-Spark-stage breakdown of ONE SparkEntry
 *  query (the generic twin of KgStageProbe — the sandbox has no UI, so
 *  this is the "open the Stages tab" step for any declared query).
 *  Run: runMain graft.tools.QStageProbe q81_longest_repeats [warmRuns] */
object QStageProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q81_longest_repeats"
    val warm = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qstageprobe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        sys.props.getOrElse("spark.local.dir", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var capture = false
    @volatile var nJobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(ev: SparkListenerJobStart): Unit =
        if (capture) nJobs += 1
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        if (capture) {
          val si = ev.stageInfo
          val m = si.taskMetrics
          val dur = for {
            a <- si.completionTime; b <- si.submissionTime
          } yield (a - b) / 1000.0
          println(f"[qstage] id=${si.stageId}%4d dur=${dur.getOrElse(-1.0)}%6.2fs " +
            f"tasks=${si.numTasks}%3d run=${m.executorRunTime / 1000.0}%7.2fs " +
            f"cpu=${m.executorCpuTime / 1e9}%7.2fs " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB  ${si.name.take(60)}")
        }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to warm).foreach(_ => fn(spark, sfDir).count())
    capture = true
    val t0 = System.nanoTime()
    val c = fn(spark, sfDir).count()
    println(f"[qstage] === $name total ${(System.nanoTime() - t0) / 1e9}%6.2f s " +
      s"(rows=$c jobs=$nJobs)")
    capture = false
    spark.stop()
  }
}
