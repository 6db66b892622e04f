package graft.tools

/** r6 guide-§1 micro: single-thread split of Annotator.annotateText's
 *  internals (tokenize | ssplit | ner | coref | token-build) so the next
 *  optimization targets the measured component, not a guess.
 *  Run: runMain graft.tools.AnnSplitMicro [nPages] */
object AnnSplitMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    (0 until 2000).foreach { i =>
      graft.nlp.Annotator.annotate(graft.fixtures.PageGen.page(i)._1)
    }
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[annmicro] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }
    val texts = (0 until n).map { i =>
      val p = graft.fixtures.PageGen.page(i)._1
      (p.url, graft.nlp.TextExtractor.extract(p.text, p.html))
    }
    val raws = time("tokenize")(texts.map { case (_, t) =>
      graft.nlp.Tokenizer.tokenize(t) })
    val spansA = time("ssplit")(texts.zip(raws).map { case ((_, t), r) =>
      graft.nlp.Tokenizer.sentenceSpans(t, r) })
    val words = texts.indices.map { i =>
      spansA(i).map { case (a, b) => (a until b).map(raws(i)(_).text) } }
    val tagged = time("ner")(words.map(_.map(graft.nlp.Ner.tag)))
    time("coref")(texts.indices.foreach { i =>
      graft.nlp.Coref.resolve(words(i).zip(tagged(i).map(_.ner))) })
    time("pos")(words.foreach(_.foreach(_.foreach(graft.nlp.PosTagger.tag))))
    time("full")(texts.foreach { case (u, t) =>
      graft.nlp.Annotator.annotateText(u, t) })
    println(s"[annmicro] pages=$n sents=${spansA.map(_.size).sum}")
  }
}
