package graft.tools
import org.apache.spark.sql.SparkSession
import graft.model.{Sentence}
object SentProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val (pages, gold) = graft.fixtures.PageGen.corpus(150)
    val needle = args.headOption.getOrElse("founded")
    val ds = spark.createDataset(pages.filter(_.text.contains(needle)).take(1))
    pages.filter(_.text.contains(needle)).take(1).foreach(p => println("PAGE: " + p.text))
    val sents = graft.pipeline.KGPipeline.sentences(spark, ds).collect()
    sents.filter(_.text.contains(needle.split(" ").head)).foreach { s =>
      println("SENT: " + s.text)
      println("TOK:  " + s.tokens.map(t => s"${t.word}/${t.ner}").mkString(" "))
      graft.extract.Candidates.fromSentence(s).foreach { c =>
        println(s"CAND: ${c.subj}[${c.subj_type}] -> ${c.obj}[${c.obj_type}] between=${c.between.mkString(" ")}")
        graft.extract.Scorer.toFills(c).foreach(f =>
          println(s"  FILL: ${f.pred} ${f.score}"))
      }
    }
    spark.stop()
  }
}
