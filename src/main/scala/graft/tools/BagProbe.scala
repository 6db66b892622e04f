package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.KGPipeline

/** r6 guide-§1 probe: BenchExtra's stage split showed the bag-aggregation
 *  stage adding ~1.9 s at 20k pages — far more than one keyed hash agg
 *  over the fills should cost. Isolate it: persist mentionFills, time
 *  aggregateBags alone (noop sink), and print its formatted plan to see
 *  whether the 5-key group + max(struct) falls out of hash aggregation
 *  (SortAggregate would explain everything: it sorts the whole fills
 *  stream by the 5-column string key). */
object BagProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val spark = SparkSession.builder().master("local[32]")
      .appName("bagprobe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[bagprobe] $label%-18s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      a
    }
    KGPipeline.run(spark,
      spark.range(1000).map(i => graft.fixtures.PageGen.page(i.toInt)._1))
      .count()
    graft.link.Linker.release()
    spark.sharedState.cacheManager.clearCache()
    val slices = spark.sparkContext.defaultParallelism * 4
    val pages = spark.range(0, n, 1, slices)
      .map(i => graft.fixtures.PageGen.page(i.toInt)._1)
    val fills = KGPipeline.mentionFills(spark,
      KGPipeline.sentences(spark, pages)).persist()
    time("fills_count")(println("  fills=" + fills.count()))
    val bags = KGPipeline.aggregateBags(spark, fills)
    println(bags.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    for (r <- 1 to 3)
      time(s"agg_noop_$r")(bags.write.format("noop").mode("overwrite").save())
    val gated = KGPipeline.yThenNoisyOrGate(spark, bags)
    for (r <- 1 to 2)
      time(s"gated_noop_$r")(gated.write.format("noop").mode("overwrite").save())
    fills.unpersist()
    spark.stop()
  }
}
