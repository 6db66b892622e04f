package graft.tools

import org.apache.spark.sql.SparkSession
import graft.pipeline.KGPipeline

/** Diagnostic: per-stage wall time at two parallelism levels to find what
 *  fails to scale. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    for (cpus <- Seq(8, 32)) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"probe-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      def time[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime(); val a = f
        println(f"[probe] cpus=$cpus $label%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        a
      }
      val pages = spark.range(n).map(i => graft.fixtures.PageGen.page(i.toInt)._1)
      val sents = KGPipeline.sentences(spark, pages).persist()
      time("sentences")(sents.count())
      val raw = KGPipeline.mentionFills(spark, sents).persist()
      time("fills")(raw.count())
      val bags = KGPipeline.aggregateBags(spark, raw).persist()
      time("bags")(bags.count())
      val link = time("linked")(KGPipeline.symmetricExpand(spark,
        graft.link.Linker.canonicalize(spark, bags)).persist())
      time("linked-count")(link.count())
      val tri = KGPipeline.consistentTriples(spark, link)
      time("cons+triples")(tri.count())
      spark.stop()
    }
  }
}
