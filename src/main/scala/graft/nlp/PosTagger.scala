package graft.nlp

/**
 * Deterministic rule/lexicon POS tagger ("pos" annotator stand-in,
 * common/Props.java:494). Only the distinctions the downstream pipeline
 * consumes are needed: NNP (proper), NN (common noun), CD (number), JJ,
 * PRP, and the trim set IN/DT/RB/EX/POS/CC used by the slot-mention
 * trimming rules (process/SlotMentionAnnotator.java:75-165).
 */
object PosTagger {

  private val determiners = Set("the", "a", "an", "this", "that", "these",
    "those", "each", "every", "some", "any", "no")
  private val prepositions = Set("of", "in", "on", "at", "by", "for",
    "with", "from", "to", "into", "over", "under", "about", "after",
    "before", "between", "during", "through", "as", "since", "until",
    "near", "against", "among", "within", "without", "via")
  private val conjunctions = Set("and", "or", "but", "nor", "yet")
  private val pronouns = Set("he", "she", "it", "they", "him", "her",
    "them", "his", "hers", "its", "their", "theirs", "i", "we", "you",
    "me", "us", "who", "whom", "himself", "herself", "itself")
  private val adverbs = Set("not", "also", "very", "too", "then", "now",
    "here", "there", "soon", "later", "already", "still", "never",
    "always", "often", "again", "once", "formerly", "previously")
  private val verbs = Set("is", "was", "are", "were", "be", "been",
    "being", "am", "has", "have", "had", "do", "does", "did", "will",
    "would", "can", "could", "may", "might", "shall", "should", "must",
    "born", "died", "works", "worked", "working", "founded", "established",
    "created", "married", "graduated", "attended", "studied", "joined",
    "serves", "served", "serving", "lives", "lived", "living", "leads",
    "led", "employs", "employed", "owns", "owned", "acquired", "charged",
    "convicted", "accused", "named", "known", "based", "headquartered",
    "resides", "resided", "wed", "succumbed", "passed", "practices",
    "converted", "dissolved", "became", "become", "announced", "said",
    "says", "reported", "wrote", "holds", "held", "runs", "ran",
    "appointed", "appoints", "appoint", "raised", "promoted", "elected")
  private val adjSuffix = Seq("ous", "ful", "ive", "ical", "ish", "less")

  def tag(word: String): String = {
    val lw = word.toLowerCase
    if (word.isEmpty) "SYM"
    else if (word == "'s" || word == "’s") "POS"
    else if (lw == "there") "EX"
    else if (determiners(lw)) "DT"
    else if (conjunctions(lw)) "CC"
    else if (prepositions(lw)) "IN"
    else if (pronouns(lw)) "PRP"
    else if (adverbs(lw)) "RB"
    else if (verbs(lw)) "VB"
    else if (word.charAt(0).isDigit) "CD"
    else if (lw == "%" || !word.exists(_.isLetterOrDigit)) "SYM"
    else if (word.charAt(0).isUpper) "NNP"
    else if (lw.endsWith("ly") && lw.length > 3) "RB"
    else if (adjSuffix.exists(s => lw.endsWith(s) && lw.length > s.length + 1)) "JJ"
    else "NN"
  }
}
