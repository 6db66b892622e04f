package graft.tools

import org.apache.spark.sql.SparkSession
import graft.fixtures.PageGen
import graft.pipeline.KGPipeline

/** Diagnostic: run the full pipeline over the synthetic corpus and report
 *  triple-set P/R vs planted gold, printing mismatches. */
object DebugE2E {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 60
    val classifier = if (args.length > 1) args(1) else "lr"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // n = -1 selects the hand-authored out-of-generator set (HandEval)
    val (pages, gold) =
      if (n < 0) { val (p, g) = graft.fixtures.HandEval.corpus(); (p, g.toSet) }
      else PageGen.corpus(n)
    val pagesDs = spark.createDataset(pages)
    val triples =
      KGPipeline.run(spark, pagesDs, classifier = classifier).collect()
    val got = triples.map(t => (t.subj, t.pred, t.obj)).toSet
    val want = gold.map(g => (g.subj, g.pred, g.obj))

    val tp = got.intersect(want).size
    val precision = if (got.nonEmpty) tp.toDouble / got.size else 0.0
    val recall = if (want.nonEmpty) tp.toDouble / want.size else 0.0
    println(f"n=$n classifier=$classifier got=${got.size} want=${want.size} tp=$tp P=$precision%.4f R=$recall%.4f")

    val fp = (got -- want).toSeq.sortBy(_.toString)
    val fn = (want -- got).toSeq.sortBy(_.toString)
    println(s"--- false positives (${fp.size}):")
    fp.take(40).foreach(t => println(s"  FP $t"))
    println(s"--- false negatives (${fn.size}):")
    fn.take(40).foreach(t => println(s"  FN $t"))
    spark.stop()
  }
}
