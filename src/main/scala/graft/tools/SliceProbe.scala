package graft.tools

import org.apache.spark.sql.SparkSession

/** Task-granularity diagnostic for the N->4N scaling gate: the scale
 *  bench's input is spark.range(n), whose partition count equals the
 *  core count — one task per core in the dominant NLP/extract job, so
 *  the job ends when the SLOWEST core ends (no straggler amortization,
 *  and PageGen cost varies by template). Times the full pipeline at two
 *  thread counts for several input-slice multipliers (and optionally a
 *  shuffle-partition multiplier) to measure whether finer tasks buy the
 *  4N side more than the N side. */
object SliceProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 300000
    val levels = if (args.length > 1) args(1).split(",").toSeq.map(_.toInt)
      else Seq(4, 16)
    val factors = if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
      else Seq(1, 4, 8)
    val shufFactor = if (args.length > 3) args(3).toInt else 1
    val rounds = if (args.length > 4) args(4).toInt else 1
    // best-of over interleaved repeats: throttling only slows runs, so the
    // per-config minimum is selection-free (same rule as the scale bench)
    val results = scala.collection.mutable.Map[(Int, Int), Double]()
    for (round <- 1 to rounds; cpus <- levels; f <- factors) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"slice-$cpus-$f")
        .config("spark.sql.shuffle.partitions", (cpus * shufFactor).toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      def pages(m: Int, slices: Int) =
        spark.range(0, m, 1, slices).map(i => graft.fixtures.PageGen.page(i.toInt)._1)
      graft.pipeline.KGPipeline.run(spark, pages(1000, cpus)).count() // warm
      graft.link.Linker.release()
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      graft.pipeline.KGPipeline.run(spark, pages(n, cpus * f)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      results((cpus, f)) = math.min(sec, results.getOrElse((cpus, f), Double.MaxValue))
      println(f"[slice] cpus=$cpus slices=${cpus * f} shuf=${cpus * shufFactor} $sec%7.1f s ${n / sec}%9.1f pages/s")
      graft.link.Linker.release()
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    if (levels.length == 2)
      for (f <- factors) {
        val eff = results((levels.head, f)) /
          (results((levels(1), f)) * (levels(1).toDouble / levels.head))
        println(f"[slice] factor=$f eff(${levels.head}->${levels(1)})=$eff%5.3f")
      }
  }
}
