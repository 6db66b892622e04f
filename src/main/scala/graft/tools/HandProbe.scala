package graft.tools
import org.apache.spark.sql.SparkSession
object HandProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (pages, _) = graft.fixtures.HandEval.corpus()
    val idx = args.headOption.map(_.toInt).getOrElse(2)
    val one = spark.createDataset(Seq(pages(idx)))
    val sents = graft.pipeline.KGPipeline.sentences(spark, one).collect()
    sents.foreach { s =>
      println("SENT: " + s.text)
      println("TOKENS: " + s.tokens.map(t => s"${t.word}/${t.ner}").mkString(" "))
    }
    sents.foreach { s =>
      graft.extract.Candidates.fromSentence(s).foreach { c =>
        println(s"CAND: ${c.subj}[${c.subj_type}] -> ${c.obj}[${c.obj_type}]")
        val fills = graft.extract.Scorer.toFills(c)
        fills.foreach(f => println(s"  FILL: ${f.pred} score=${f.score}"))
      }
    }
    spark.stop()
  }
}
