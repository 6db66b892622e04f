package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import graft.pipeline.KGPipeline

/** r6 guide-§1/§7 probe: per-Spark-stage wall/task-time breakdown of ONE
 *  full kg_pipeline run at bench scale (local[32], 20k pages) from a
 *  stage listener — the sandbox has no UI, so this is the "open the
 *  Stages tab" step. Prints, per completed stage: duration, task count,
 *  executor run/CPU time sums, shuffle read/write bytes, and the stage
 *  name (which names the RDD/operator that created it). */
object KgStageProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val runs = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .appName("kgstageprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    @volatile var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(ev: SparkListenerStageCompleted): Unit =
        if (capture) {
          val si = ev.stageInfo
          val m = si.taskMetrics
          val dur = for {
            a <- si.completionTime; b <- si.submissionTime
          } yield (a - b) / 1000.0
          println(f"[kgstage] id=${si.stageId}%3d dur=${dur.getOrElse(-1.0)}%6.2fs " +
            f"tasks=${si.numTasks}%3d run=${m.executorRunTime / 1000.0}%7.2fs " +
            f"cpu=${m.executorCpuTime / 1e9}%7.2fs " +
            f"gc=${m.jvmGCTime / 1000.0}%5.2fs " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB  ${si.name}")
        }
    })
    def pages = {
      val slices = spark.sparkContext.defaultParallelism * 4
      spark.range(0, n, 1, slices)
        .map(i => graft.fixtures.PageGen.page(i.toInt)._1)
    }
    // warm (JIT + codegen), uncaptured
    KGPipeline.run(spark, pages.limit(1000).as[graft.model.Page]).count()
    graft.link.Linker.release()
    spark.sharedState.cacheManager.clearCache()
    for (r <- 1 to runs) {
      capture = true
      val t0 = System.nanoTime()
      val c = KGPipeline.run(spark, pages).count()
      println(f"[kgstage] === run $r total ${(System.nanoTime() - t0) / 1e9}%6.2f s (triples=$c)")
      capture = false
      graft.link.Linker.release()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
