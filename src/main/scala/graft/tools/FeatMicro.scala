package graft.tools

/** r6 guide-§1 micro-profile INSIDE the candidate/scoring hot path (the
 *  dominant map-stage CPU per KgStageProbe): splits Candidates.fromSentence
 *  cost into mention extraction | DepLite parse | full pair loop, and
 *  measures Scorer.toFills separately, all single-threaded over the same
 *  20k-page corpus NlpMicro uses. */
object FeatMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    (0 until 2000).foreach { i =>
      val p = graft.fixtures.PageGen.page(i)._1
      graft.nlp.Annotator.annotate(p)
        .flatMap(graft.extract.Candidates.fromSentence)
        .flatMap(graft.extract.Scorer.toFills)
    }
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[feat] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }
    val sents = (0 until n).flatMap { i =>
      val p = graft.fixtures.PageGen.page(i)._1
      graft.nlp.Annotator.annotate(p)
    }
    val small = sents.filter(_.tokens.length <= Candidates.MaxSentenceTokensPub)
    println(s"[feat] sentences=${sents.size} admissible=${small.size}")
    time("mentions")(small.foreach(s => graft.extract.Mentions.extract(s)))
    time("deplite")(small.foreach(s =>
      graft.nlp.DepLite.parse(s.tokens.toIndexedSeq)))
    val cands = time("fromSentence")(
      small.map(graft.extract.Candidates.fromSentence))
    time("score")(cands.foreach(_.flatMap(graft.extract.Scorer.toFills)))
    println(s"[feat] cands=${cands.map(_.size).sum}")
  }
}

object Candidates {
  val MaxSentenceTokensPub: Int = graft.extract.Candidates.MaxSentenceTokens
}

/** Split Annotator.annotateText cost: tokenize | ssplit | NER | coref |
 *  token-object build (same corpus as FeatMicro). */
object NlpSplitMicro {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    (0 until 2000).foreach { i =>
      val p = graft.fixtures.PageGen.page(i)._1
      graft.nlp.Annotator.annotate(p)
    }
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[nlps] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      a
    }
    val texts = (0 until n).map { i =>
      val p = graft.fixtures.PageGen.page(i)._1
      (p.url, graft.nlp.TextExtractor.extract(p.text, p.html))
    }
    val toks = time("tokenize")(texts.map { case (_, t) =>
      (t, graft.nlp.Tokenizer.tokenize(t)) })
    val spans = time("ssplit")(toks.map { case (t, r) =>
      (t, r, graft.nlp.Tokenizer.sentenceSpans(t, r)) })
    val sw = time("sentwords")(spans.map { case (_, r, sp) =>
      sp.map { case (a, b) => (a until b).map(r(_).text) } })
    val tagged = time("ner")(sw.map(_.map(graft.nlp.Ner.tag)))
    time("coref")(sw.zip(tagged).foreach { case (w, t) =>
      graft.nlp.Coref.resolve(w.zip(t.map(_.ner))) })
    time("full")(texts.foreach { case (u, t) =>
      graft.nlp.Annotator.annotateText(u, t) })
    println(s"[nlps] docs=$n")
  }
}
