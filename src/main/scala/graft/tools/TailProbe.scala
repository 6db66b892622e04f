package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.KGPipeline

/** Fused-job diagnostic: the real pipeline runs as (A) the alias-collect
 *  job (NLP -> fills -> bags -> unary -> persist -> blocked alias pairs ->
 *  driver union-find) and (B) the downstream count (cached fills ->
 *  symmetric -> per-entity consistency -> triple merge). Times each at two
 *  parallelism levels to locate the non-scaling tail. */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 300000
    val levels = if (args.length > 1) args(1).split(",").toSeq.map(_.toInt)
      else Seq(8, 32)
    for (cpus <- levels) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"tail-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val a = f
        println(f"[tail] cpus=$cpus $label%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        a
      }
      // warm codegen/JIT
      KGPipeline.run(spark,
        spark.range(1000).map(i => graft.fixtures.PageGen.page(i.toInt)._1))
        .count()
      spark.sharedState.cacheManager.clearCache()
      for (round <- 1 to 2) {
        val pages = spark.range(n).map(i =>
          graft.fixtures.PageGen.page(i.toInt)._1)
        val bags = KGPipeline.aggregateBags(spark,
          KGPipeline.mentionFills(spark, KGPipeline.sentences(spark, pages)))
        // job A: eager alias build (persists the bags internally)
        val linked = time(s"r$round-jobA")(
          KGPipeline.symmetricExpand(spark, KGPipeline.linked(spark, bags)))
        // job B: downstream shuffle off the cache (fused stage 7+8)
        time(s"r$round-jobB")(
          KGPipeline.consistentTriples(spark, linked).count())
        spark.sharedState.cacheManager.clearCache()
      }
      spark.stop()
    }
  }
}
