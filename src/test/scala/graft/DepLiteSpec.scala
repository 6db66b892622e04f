package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.Token
import graft.nlp.DepLite

/** F1 dependency families over the deterministic lite arc layer —
 *  pure functions, no SparkSession needed. */
class DepLiteSpec extends AnyFunSuite {

  private def tok(word: String, pos: String, ner: String = "O") =
    Token(word, word, 0, 0, pos, ner, "", "")

  test("SVO with a collapsed preposition yields the reference path shape") {
    val toks = IndexedSeq(
      tok("John", "NNP", "PERSON"), tok("founded", "VBD"),
      tok("Acme", "NNP", "ORGANIZATION"), tok("in", "IN"),
      tok("Paris", "NNP", "CITY"))
    val arcs = DepLite.parse(toks)
    assert(arcs(0) == DepLite.Arc(1, "nsubj"))
    assert(arcs(2) == DepLite.Arc(1, "dobj"))
    assert(arcs(4) == DepLite.Arc(2, "prep_in")) // collapsed through "in"
    val fs = DepLite.pathFeatures(toks, arcs, 0, 1, 4, 5)
    assert(fs.contains("dep_path=subj-> <-obj <-prep_in"), fs.mkString("; "))
    assert(fs.contains("dep_path_lowlevel=nsubj-> <-dobj <-prep_in"))
    // the verb on the path contributes the three stub features
    assert(fs.contains("dep_verb=subj-> founded <-obj <-prep_in"))
  }

  test("NP internals: det/amod/nn attach to the chunk head; appositive NP") {
    val toks = IndexedSeq(
      tok("Acme", "NNP", "ORGANIZATION"), tok(",", ","),
      tok("a", "DT"), tok("software", "NN"), tok("maker", "NN"),
      tok(",", ","), tok("bought", "VBD"), tok("Beta", "NNP", "ORGANIZATION"))
    val arcs = DepLite.parse(toks)
    assert(arcs(2) == DepLite.Arc(4, "det"))
    assert(arcs(3) == DepLite.Arc(4, "nn"))
    assert(arcs(4) == DepLite.Arc(0, "appos"))
    assert(arcs(0) == DepLite.Arc(6, "nsubj"))
    assert(arcs(7) == DepLite.Arc(6, "dobj"))
    // entity (Acme) to the appositive head: a one-hop path, generalized
    val fs = DepLite.pathFeatures(toks, arcs, 0, 1, 2, 5)
    assert(fs.contains("dep_path=<-appos"), fs.mkString("; "))
  }

  test("same-head span pair yields no dependency features (reference bail-out)") {
    val toks = IndexedSeq(
      tok("the", "DT"), tok("software", "NN"), tok("maker", "NN"))
    val arcs = DepLite.parse(toks)
    // both spans end on the chunk head "maker" -> same syntactic head
    assert(DepLite.pathFeatures(toks, arcs, 0, 3, 1, 3).isEmpty)
  }

  test("arcs are a deterministic pure function of the tokens") {
    val toks = IndexedSeq(
      tok("Jane", "NNP", "PERSON"), tok("was", "VBD"), tok("born", "VBN"),
      tok("in", "IN"), tok("Lyon", "NNP", "CITY"), tok("and", "CC"),
      tok("moved", "VBD"), tok("to", "TO"), tok("Nice", "NNP", "CITY"))
    val a = DepLite.parse(toks)
    val b = DepLite.parse(toks)
    assert(a.toSeq == b.toSeq)
    // born (verb-run head) takes the subject; Lyon collapses through "in"
    assert(a(0).label == "nsubj")
    assert(a(4).label.startsWith("prep_") || a(4).label == "pobj")
  }
}
