package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.nlp._
import graft.model.NER

class NlpSpec extends AnyFunSuite {

  test("text extraction is byte-identical for every corpus page (html path)") {
    val (pages, _) = graft.fixtures.PageGen.corpus(120)
    pages.foreach { p =>
      val fromHtml = TextExtractor.extract(null, p.html)
      assert(fromHtml == p.text, s"byte mismatch for ${p.url}")
      // identity path: text column wins verbatim
      assert(TextExtractor.extract(p.text, p.html) eq p.text)
    }
  }

  test("extraction drops nav blocks (graft-extract-2): links are not text") {
    val html = "<html><head><title>x</title></head><body><p>body text</p>" +
      "<nav class=\"rel\"><a href=\"/a\">Anchor One</a>" +
      "<a href=\"https://x.y/b\">Anchor Two</a></nav></body></html>"
    assert(TextExtractor.extractHtml(html) == "body text")
    assert(TextExtractor.Version == "graft-extract-2")
  }

  test("extraction handles entities, multibyte and numeric refs") {
    val html = "<html><head><title>x</title></head><body><p>a &amp; b &lt;c&gt; café &#x4e2d;</p></body></html>"
    assert(TextExtractor.extractHtml(html) == "a & b <c> café 中")
    // escape/extract round-trip
    val s = "5 < 6 & 7 > 2 — ümlauts"
    assert(TextExtractor.extractHtml("<p>" + TextExtractor.escapeHtml(s) + "</p>") == s)
  }

  test("tokenizer scanner == regex alternation (differential, incl. fuzz)") {
    // r6: tokenize() is a hand-rolled scanner; the Tok regex stays as the
    // DEFINITION and this test diffs full (text, begin, end) streams over
    // the generated corpus plus adversarial and fuzzed strings.
    def diff(s: String): Unit = {
      val a = Tokenizer.tokenize(s)
      val b = Tokenizer.tokenizeRegex(s)
      assert(a == b, s"tokenizer divergence on <${s.take(120)}>")
    }
    val adversarial = Seq(
      "", " ", "\t\n\f\r", " ", "a b", // \s is ASCII-only
      "http://", "https://", "www.", "http://x", "www.x",
      "see https://ex.com/a,b). end", "www.site.com/path?q=1,2.",
      "U.S. and U.K. vs e.g. and Ph.D. and A.B.C and i.e.x",
      "75-year-old 3-D 10-k- 12-", "1,234.5% 1. 2,3 4.5.6 42%",
      "O'Neil's dog don't 'tis l'été ’s x-ray-ish co- -dash",
      "naïve café mañana Σωκράτης 北京大学 日本",
      "𝒜𝒝 ab𝒜cd", // math script letters (surrogates)
      "a\uD800b \uDC00c", // unpaired surrogates
      "He said \"quote.\" (parens)! end?", "a..b ...c d.-e",
      "Mr. Smith met Dr. Jones Jr. at Acme Inc. today.")
    adversarial.foreach(diff)
    (0 until 200).foreach(i => diff(graft.fixtures.PageGen.page(i)._1.text))
    // deterministic fuzz over a nasty alphabet
    val alphabet = "aB1 .,-'’%\"<>:/wh\t\nï北 𝒜"
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val len = rnd.nextInt(30)
      diff((0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
  }

  test("tokenizer: offsets, abbreviations, clitics, urls") {
    val t = "Dr. Smith's site is https://www.x.com. Really."
    val toks = Tokenizer.tokenize(t)
    val words = toks.map(_.text)
    assert(words == Vector("Dr.", "Smith", "'s", "site", "is",
      "https://www.x.com", ".", "Really", "."))
    // offsets reconstruct the original slices
    toks.foreach(tok => assert(t.substring(tok.begin, tok.end).nonEmpty))
  }

  test("sentence splitting honors abbreviations and paragraph breaks") {
    val t = "Acme Inc. was founded in 1990. It grew fast.\nNew paragraph here"
    val toks = Tokenizer.tokenize(t)
    val spans = Tokenizer.sentenceSpans(t, toks)
    assert(spans.length == 3)
  }

  test("NER: gazetteer, dates with timex, person, org, acronym") {
    val words = Vector("John", "Smith", "was", "born", "in", "Paris",
      "on", "March", "3", ",", "1980", ".")
    val tag = Ner.tag(words)
    assert(tag.ner(0) == NER.PERSON && tag.ner(1) == NER.PERSON)
    assert(tag.ner(5) == NER.CITY)
    assert(tag.ner(7) == NER.DATE && tag.ner(10) == NER.DATE)
    assert(tag.timex(7) == "1980-03-03")

    val org = Ner.tag(Vector("Global", "Dynamics", "Avionics", "Inc.", "grew"))
    assert((0 to 3).forall(i => org.ner(i) == NER.ORGANIZATION))
    assert(org.ner(4) == "O")

    val yr = Ner.tag(Vector("In", "1985", "he", "left"))
    assert(yr.ner(1) == NER.DATE && yr.timex(1) == "1985-XX-XX")
  }

  test("DURATION: hyphenated age compounds survive tokenization and tag") {
    // "75-year-old" must stay ONE token (the number branch alone would
    // split it into 75 / - / year-old and the DURATION rule could never
    // fire on any token)
    val toks = Tokenizer.tokenize("The 75-year-old actor retired.")
    assert(toks.map(_.text).contains("75-year-old"))
    val tag = Ner.tag(Vector("The", "75-year-old", "actor"))
    assert(tag.ner(1) == NER.DURATION)
  }

  test("coref: representative mention resolves cataphora + partial names") {
    // surname appears BEFORE the full name in the document: the doc-wide
    // inventory (pass 1) still finds the representative
    val s1 = (Vector("Smith", "spoke", "first", "."),
      Array(NER.PERSON, "O", "O", "O"))
    val s2 = (Vector("John", "Smith", "repeated", "that", "."),
      Array(NER.PERSON, NER.PERSON, "O", "O", "O"))
    val ante = Coref.resolve(IndexedSeq(s1, s2))
    assert(ante(0)(0) == "John Smith")
    // partial multi-token name -> longest containing doc mention
    val t1 = (Vector("Robert", "James", "Keller", "won", "."),
      Array(NER.PERSON, NER.PERSON, NER.PERSON, "O", "O"))
    val t2 = (Vector("Robert", "Keller", "spoke", "."),
      Array(NER.PERSON, NER.PERSON, "O", "O"))
    val a2 = Coref.resolve(IndexedSeq(t1, t2))
    assert(a2(1)(0) == "Robert James Keller")
  }

  test("coref chain cleaning: ambiguous + nested mentions stay unresolved") {
    // two distinct people share a surname: "Smith" must NOT be chained
    // into either (dcoref-style cleaning; the old longest-wins pick merged
    // distinct entities)
    val s1 = (Vector("John", "Smith", "and", "Anna", "Smith", "spoke", "."),
      Array(NER.PERSON, NER.PERSON, "O", NER.PERSON, NER.PERSON, "O", "O"))
    val s2 = (Vector("Smith", "agreed", "."),
      Array(NER.PERSON, "O", "O"))
    val ante = Coref.resolve(IndexedSeq(s1, s2))
    assert(ante(1)(0) == "", s"ambiguous surname resolved to ${ante(1)(0)}")
    // nested org names: an org that carries its own head word is a complete
    // name and must not chain into a longer DIFFERENT org...
    val o1 = (Vector("Stanford", "University", "Hospital", "Group",
      "expanded", "."),
      Array(NER.ORGANIZATION, NER.ORGANIZATION, NER.ORGANIZATION,
        NER.ORGANIZATION, "O", "O"))
    val o2 = (Vector("Stanford", "University", "teaches", "."),
      Array(NER.ORGANIZATION, NER.ORGANIZATION, "O", "O"))
    val a2 = Coref.resolve(IndexedSeq(o1, o2))
    assert(a2(1)(0) == "", s"nested org resolved to ${a2(1)(0)}")
    // ...but legal-suffix boilerplate still chains (same entity)
    val o3 = (Vector("First", "National", "Bank", "Corp.", "reported", "."),
      Array(NER.ORGANIZATION, NER.ORGANIZATION, NER.ORGANIZATION,
        NER.ORGANIZATION, "O", "O"))
    val o4 = (Vector("First", "National", "Bank", "grew", "."),
      Array(NER.ORGANIZATION, NER.ORGANIZATION, NER.ORGANIZATION, "O", "O"))
    val a3 = Coref.resolve(IndexedSeq(o3, o4))
    assert(a3(1)(0) == "First National Bank Corp.")
  }

  test("TIMEX value is the canonical antecedent of temporal tokens") {
    val sents = Annotator.annotateText("https://x.example/timex",
      "Maria Keller joined Global Dynamics Corp. on March 3, 1980. She left.")
    val toks = sents.head.tokens
    val dateTok = toks.find(_.timex.nonEmpty).get
    assert(dateTok.antecedent == dateTok.timex)
    assert(dateTok.timex == "1980-03-03")
    // non-temporal antecedents unaffected (She -> Maria Keller)
    val she = sents(1).tokens.find(_.word == "She").get
    assert(she.antecedent == "Maria Keller")
  }

  test("coref: pronoun, surname and acronym antecedents") {
    val s1 = (Vector("John", "Smith", "works", "at", "IBM", "."),
      Array(NER.PERSON, NER.PERSON, "O", "O", NER.ORGANIZATION, "O"))
    val s2 = (Vector("He", "likes", "Smith", "Lake", "."),
      Array("O", "O", "O", "O", "O"))
    val ante = Coref.resolve(IndexedSeq(s1, s2))
    assert(ante(1)(0) == "John Smith") // He -> John Smith
    assert(Coref.isAcronymOf("GDA", Seq("Global", "Dynamics", "Avionics")))
    assert(!Coref.isAcronymOf("GD", Seq("Global", "Dynamics", "Avionics")))
    assert(Coref.approxTokenMatch("companies", "company") ||
      Coref.approxTokenMatch("Corp.", "Corp"))
  }
}
