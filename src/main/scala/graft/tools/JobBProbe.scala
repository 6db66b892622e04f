package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.KGPipeline

/** Isolates the downstream consistency shuffle (symmetricExpand ->
 *  consistentTriples over cached bags) at two parallelism levels and
 *  several shuffle-partition counts: LinkProbe showed the linker's driver
 *  segment is ~0 at bench scale (pairs=0), so the non-scaling tail must
 *  be here or in the alias-pair shuffles. Prints per-config times plus
 *  group-size stats (max/avg) to separate skew from fixed overhead. */
object JobBProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1200000
    val levels = if (args.length > 1) args(1).split(",").toSeq.map(_.toInt)
      else Seq(4, 16)
    for (cpus <- levels) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"jobb-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val a = f
        println(f"[jobb] cpus=$cpus $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        a
      }
      KGPipeline.run(spark,
        spark.range(1000).map(i => graft.fixtures.PageGen.page(i.toInt)._1))
        .count()
      graft.link.Linker.release()
      spark.sharedState.cacheManager.clearCache()
      val pages = spark.range(n).map(i =>
        graft.fixtures.PageGen.page(i.toInt)._1)
      val bags = KGPipeline.yThenNoisyOrGate(spark,
        KGPipeline.aggregateBags(spark,
          KGPipeline.mentionFills(spark, KGPipeline.sentences(spark, pages))))
        .persist()
      time("bags")(bags.count())
      for (parts <- Seq(cpus, cpus * 4, 128); rep <- 1 to 2) {
        spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
        time(s"jobB-p$parts-$rep")(
          KGPipeline.consistentTriples(spark,
            KGPipeline.symmetricExpand(spark, bags)).count())
      }
      if (cpus == levels.last) {
        val sizes = bags.groupByKey(_.subj).mapGroups((_, it) => it.size)
          .toDF("sz")
        val row = sizes.selectExpr("count(*) as groups", "max(sz) as mx",
          "avg(sz) as avg", "sum(sz) as rows").collect()(0)
        println(s"[jobb] groups=${row.getLong(0)} maxGroup=${row.getInt(1)} " +
          f"avgGroup=${row.getDouble(2)}%.1f rows=${row.getLong(3)}")
      }
      bags.unpersist()
      spark.stop()
    }
  }
}
