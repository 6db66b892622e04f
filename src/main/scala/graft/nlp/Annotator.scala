package graft.nlp

import graft.model.{Page, Sentence, Token}

/**
 * The composed per-document NLP stage: Page -> Seq[Sentence].
 *
 * Mirrors the reference pipeline `tokenize, ssplit, pos, lemma, ner,
 * regexner, (parse), dcoref` (common/Props.java:494) with the deterministic
 * components in this package; invoked via ONE `mapPartitions` over the pages
 * table (SURVEY.md §2.3) — the whole function is embarrassingly parallel per
 * document, the reference's `synchronized` annotate bottleneck
 * (process/KBPProcess.java:166-171) disappears.
 */
object Annotator {

  /** Early pre-NLP gates Catalyst can't invent (SURVEY.md §4):
   *  language filter + degenerate-text filter. */
  def admits(lang: String, text: String): Boolean =
    lang == "en" && text != null && text.nonEmpty && text.length <= 1000000

  def docId(url: String): String =
    "doc-" + java.lang.Long.toHexString(stableHash(url))

  def stableHash(s: String): Long = {
    var h = -3750763034362895579L // FNV-1a 64
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 1099511628211L; i += 1 }
    h
  }

  def annotate(page: Page): Seq[Sentence] = {
    val text = TextExtractor.extract(page.text, page.html)
    annotateText(page.url, text)
  }

  def annotateText(url: String, text: String): Seq[Sentence] = {
    val id = docId(url)
    val raw = Tokenizer.tokenize(text)
    val spans = Tokenizer.sentenceSpans(text, raw)
    // per-sentence word + NER arrays
    val sentWords = spans.map { case (a, b) => (a until b).map(raw(_).text) }
    val tagged = sentWords.map(Ner.tag)
    val antecedents = Coref.resolve(sentWords.zip(tagged.map(_.ner)))
    spans.zipWithIndex.map { case ((a, b), si) =>
      val words = sentWords(si)
      val t = tagged(si)
      val ante = antecedents(si)
      val sentBegin = raw(a).begin
      val toks = (0 until (b - a)).map { k =>
        val rt = raw(a + k)
        Token(
          word = rt.text,
          // every RawToken's text IS the exact [begin,end) slice by
          // construction (Tokenizer emits verbatim slices) — no substring
          orig = rt.text,
          begin = rt.begin - sentBegin,
          end = rt.end - sentBegin,
          pos = PosTagger.tag(rt.text),
          ner = t.ner(k),
          // TIMEX value is the canonical antecedent of a temporal token
          // (PostIRAnnotator.annotateTimex, ir/PostIRAnnotator.java:691-700)
          antecedent = if (t.timex(k).nonEmpty) t.timex(k) else ante(k),
          timex = t.timex(k))
      }
      Sentence(url, id, si, text.substring(sentBegin, raw(b - 1).end), toks)
    }
  }
}
