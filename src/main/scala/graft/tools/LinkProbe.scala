package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.KGPipeline
import graft.link.Linker

/** Splits the linking stage's wall time into its parallel and SERIAL
 *  (driver-side) parts at two parallelism levels: the serial segment is
 *  thread-count-invariant, so it is the fixed tail that caps the measured
 *  N->4N efficiency (and, on a real cluster, the driver bottleneck).
 *  Prints: bags materialize / alias-pair count / pair collect+union-find /
 *  broadcast-rewrite trigger. */
object LinkProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1200000
    val levels = if (args.length > 1) args(1).split(",").toSeq.map(_.toInt)
      else Seq(4, 16)
    for (cpus <- levels) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"link-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val a = f
        println(f"[link] cpus=$cpus $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        a
      }
      KGPipeline.run(spark,
        spark.range(1000).map(i => graft.fixtures.PageGen.page(i.toInt)._1))
        .count()
      Linker.release()
      spark.sharedState.cacheManager.clearCache()
      for (rnd <- 1 to 2) {
        val pages = spark.range(n).map(i =>
          graft.fixtures.PageGen.page(i.toInt)._1)
        val bags = KGPipeline.yThenNoisyOrGate(spark,
          KGPipeline.aggregateBags(spark,
            KGPipeline.mentionFills(spark, KGPipeline.sentences(spark, pages))))
          .persist()
        time(s"r$rnd-bags")(bags.count())
        val pairs = Linker.aliasPairs(spark, bags).persist()
        val nPairs = time(s"r$rnd-pairCount")(pairs.count())
        val collected = time(s"r$rnd-collect")(pairs.collect())
        val aliasMap = time(s"r$rnd-unionFind")(
          Linker.driverAliasMapProbe(collected))
        println(s"[link] cpus=$cpus r$rnd pairs=$nPairs aliases=${aliasMap.size}")
        val aliases = spark.createDataset(aliasMap.toSeq.sortBy(_._1))
          .toDF("name", "canon")
        val f = bags.toDF()
        import org.apache.spark.sql.functions._
        val rewritten = f
          .join(broadcast(aliases.withColumnRenamed("name", "subj")
            .withColumnRenamed("canon", "subj_canon")), Seq("subj"), "left")
          .select(coalesce($"subj_canon", $"subj").as("subj"), $"pred")
        time(s"r$rnd-bcastJoin")(rewritten.count())
        pairs.unpersist(); bags.unpersist()
        spark.sharedState.cacheManager.clearCache()
      }
      spark.stop()
    }
  }
}
