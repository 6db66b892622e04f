package graft.tools

/** Single-thread micro-profile of the per-page hot path, no Spark: where
 *  does a page's wall time go? (PageGen | tokenize+ssplit | NER+coref |
 *  mentions+candidates+features | scoring). Run: runMain graft.tools.NlpMicro [nPages] */
object NlpMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    // warm JIT
    (0 until 2000).foreach { i =>
      val p = graft.fixtures.PageGen.page(i)._1
      graft.nlp.Annotator.annotate(p)
        .flatMap(graft.extract.Candidates.fromSentence)
        .flatMap(graft.extract.Scorer.toFills)
    }
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[micro] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }
    val pages = time("pagegen")((0 until n).map(i => graft.fixtures.PageGen.page(i)._1))
    val texts = time("html2text")(pages.map(p =>
      (p.url, graft.nlp.TextExtractor.extract(p.text, p.html))))
    val toks = time("tokenize")(texts.map { case (u, t) =>
      (u, t, graft.nlp.Tokenizer.tokenize(t)) })
    val sents = time("annotate")(texts.map { case (u, t) =>
      graft.nlp.Annotator.annotateText(u, t) })
    val cands = time("candidates")(sents.map(_.flatMap(graft.extract.Candidates.fromSentence)))
    val fills = time("score")(cands.map(_.flatMap(graft.extract.Scorer.toFills)))
    println(s"[micro] pages=$n tokens=${toks.map(_._3.size).sum} " +
      s"cands=${cands.map(_.size).sum} fills=${fills.map(_.size).sum}")
  }
}
