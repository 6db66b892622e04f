package graft.nlp

import graft.model.Token

/**
 * Deterministic lite dependency layer — closes the F1 parse/dependency
 * feature families (FeatureFactory.java:654-973 `addDependencyPathFeatures`)
 * without a statistical parser (none ships in-sandbox; SURVEY.md §7).
 *
 * This is NOT a port of a parser: it is a single-pass POS-rule arc
 * assigner producing the same SHAPE of structure the reference's features
 * consume — a head index + label per token — so the three dependency
 * families (`dependency_path`, `dependency_path_lowlevel`,
 * `dependency_paths_to_verb`) can be computed with the reference's
 * shortest-undirected-path semantics. The arcs follow the classic
 * chunk-and-attach heuristics (NP chunk internals; subject before verb /
 * object after; preposition collapse to `prep_<word>` as in Stanford
 * collapsed dependencies; appositive on comma-adjacent NPs; verb-verb
 * conj). Deterministic by construction: same tokens → same arcs on every
 * executor, so features are stable across partitionings.
 *
 * Runs inside the same mapPartitions as the rest of featurization — per
 * sentence O(n) for arcs + O(n) BFS per candidate pair, no shuffle.
 */
object DepLite {

  /** One arc: token -> heads(i), label. head == -1 is the root. */
  final case class Arc(head: Int, label: String)

  private def isNoun(pos: String) =
    pos.startsWith("NN") || pos == "PRP" || pos == "CD"
  private def inNp(pos: String) =
    isNoun(pos) || pos == "DT" || pos.startsWith("JJ") || pos == "POS" ||
      pos == "PRP$"
  private def isVerb(pos: String) = pos.startsWith("VB") || pos == "MD"

  /** Deterministic arcs for one sentence. */
  def parse(toks: IndexedSeq[Token]): Array[Arc] = {
    val n = toks.length
    val arcs = Array.fill(n)(Arc(-1, "dep"))

    // ---- pass 1: NP chunks; head = last noun-ish token of the run
    val npHeadOf = Array.fill(n)(-1) // token -> its NP head (or itself)
    var i = 0
    while (i < n) {
      if (inNp(toks(i).pos)) {
        var j = i
        while (j < n && inNp(toks(j).pos)) j += 1
        var h = j - 1
        while (h > i && !isNoun(toks(h).pos)) h -= 1
        var k = i
        while (k < j) {
          npHeadOf(k) = h
          if (k != h) {
            val lab = toks(k).pos match {
              case "DT" => "det"
              case "POS" | "PRP$" => "poss"
              case "CD" => "num"
              case p if p.startsWith("JJ") => "amod"
              case _ => "nn"
            }
            arcs(k) = Arc(h, lab)
          }
          k += 1
        }
        i = j
      } else i += 1
    }

    // ---- pass 2: verb groups; head = last VB* of the run (aux before)
    val vbHeadOf = Array.fill(n)(-1)
    i = 0
    while (i < n) {
      if (isVerb(toks(i).pos)) {
        var j = i
        while (j < n && (isVerb(toks(j).pos) || toks(j).pos == "RB")) j += 1
        while (j > i && !isVerb(toks(j - 1).pos)) j -= 1
        val h = j - 1
        var k = i
        while (k < j) {
          vbHeadOf(k) = h
          if (k != h)
            arcs(k) = Arc(h, if (toks(k).pos == "RB") "advmod" else "aux")
          k += 1
        }
        i = j
      } else i += 1
    }

    // ---- pass 3: clause-level attachment over unit heads, left to right
    var lastVerb = -1
    var lastNpHead = -1
    var lastPrep = -1  // pending preposition waiting for its object
    var commaSinceNp = false
    val pendingSubjects = scala.collection.mutable.ArrayBuffer[Int]()
    i = 0
    while (i < n) {
      val p = toks(i).pos
      if (vbHeadOf(i) == i) {
        pendingSubjects.foreach(s => arcs(s) = Arc(i, "nsubj"))
        pendingSubjects.clear()
        if (lastVerb >= 0) arcs(i) = Arc(lastVerb, "conj")
        lastVerb = i
        lastPrep = -1
        lastNpHead = -1
      } else if (p == "IN" || p == "TO") {
        // the preposition attaches to what it modifies: the NP just left
        // of it if one is adjacent, else the clause verb
        val att = if (lastNpHead >= 0 && !commaSinceNp) lastNpHead
          else lastVerb
        if (att >= 0) arcs(i) = Arc(att, "prep")
        lastPrep = i
      } else if (npHeadOf(i) == i) {
        if (lastPrep >= 0) {
          // collapsed Stanford style: the prep's object attaches THROUGH
          // the preposition to its head, label prep_<word>
          val ph = arcs(lastPrep).head
          arcs(i) =
            if (ph >= 0) Arc(ph, "prep_" + toks(lastPrep).word.toLowerCase)
            else Arc(lastPrep, "pobj")
          lastPrep = -1
        } else if (lastNpHead >= 0 && commaSinceNp && lastVerb < 0) {
          arcs(i) = Arc(lastNpHead, "appos")
        } else if (lastNpHead >= 0 && commaSinceNp &&
                   arcs(lastNpHead).head == lastVerb) {
          arcs(i) = Arc(lastNpHead, "appos")
        } else if (lastVerb >= 0) {
          arcs(i) = Arc(lastVerb, "dobj")
        } else {
          pendingSubjects += i
        }
        lastNpHead = i
        commaSinceNp = false
      } else if (p == ",") {
        commaSinceNp = true
      }
      i += 1
    }
    // subjects of a verbless sentence hang off the first NP head (root)
    if (pendingSubjects.nonEmpty) {
      val root = pendingSubjects.head
      pendingSubjects.drop(1).foreach(s => arcs(s) = Arc(root, "conj"))
    }
    arcs
  }

  /** Syntactic head of a mention span [b, e): last noun-ish token. */
  def headOf(toks: IndexedSeq[Token], b: Int, e: Int): Int = {
    var h = e - 1
    while (h > b && !isNoun(toks(h).pos)) h -= 1
    h
  }

  private val generalize: String => String = {
    case "nsubj" => "subj"
    case "dobj" | "pobj" => "obj"
    case l if l.startsWith("prep_") => l
    case "nn" | "amod" | "det" | "num" | "poss" | "advmod" => "mod"
    case l => l
  }

  /** Per-sentence view of the arc forest with the UNDIRECTED adjacency
   *  prebuilt and neighbor-sorted. r6 (guide §1.2 step 2): `path` used
   *  to rebuild + sort the adjacency on EVERY call — once per candidate
   *  pair plus once per verb-on-path — though it depends only on the
   *  sentence's arcs. Build once per sentence, BFS per pair. Expansion
   *  order is identical to the old `adj(u).sortBy(_._1)` (ascending
   *  neighbor; scala sortBy is stable and so is this sort). */
  final class Forest private[DepLite] (val arcs: Array[Arc]) {
    private[DepLite] val adj: Array[Array[(Int, String, Boolean)]] = {
      val n = arcs.length
      val lists = Array.fill(n)(List.empty[(Int, String, Boolean)])
      var i = 0
      while (i < n) {
        val h = arcs(i).head
        if (h >= 0) {
          lists(i) = (h, arcs(i).label, true) :: lists(i)  // up
          lists(h) = (i, arcs(i).label, false) :: lists(h) // down
        }
        i += 1
      }
      lists.map(_.sortBy(_._1).toArray)
    }
  }

  /** Parse + prebuilt adjacency (the form the candidate loop consumes). */
  def forest(toks: IndexedSeq[Token]): Forest = new Forest(parse(toks))

  /** Shortest undirected path between two token indices over the arc
   *  forest; Nil if disconnected or identical heads — the reference's
   *  bail-outs (FeatureFactory.java:686-698). Each step is rendered
   *  "label->" (up, child to head) or "<-label" (down). */
  private def path(f: Forest, from: Int, to: Int): Seq[(Int, String)] = {
    if (from == to) return Nil
    val n = f.arcs.length
    val prev = Array.fill(n)(-1)
    val via = Array.fill(n)("")
    val queue = scala.collection.mutable.Queue(from)
    prev(from) = from
    while (queue.nonEmpty && prev(to) == -1) {
      val u = queue.dequeue()
      val nbrs = f.adj(u)
      var j = 0
      while (j < nbrs.length) {
        val (v, lab, up) = nbrs(j)
        if (prev(v) == -1) {
          prev(v) = u
          via(v) = if (up) lab + "->" else "<-" + lab
          queue += v
        }
        j += 1
      }
    }
    if (prev(to) == -1) return Nil
    var cur = to
    var acc = List.empty[(Int, String)]
    while (cur != from) {
      acc = (cur, via(cur)) :: acc
      cur = prev(cur)
    }
    acc
  }

  /** The three dependency feature families over a candidate pair
   *  (FeatureFactory.java:698-760): generalized path, low-level path,
   *  and per-path-verb stub paths. Empty when the args share a head or
   *  the path is broken — the reference's checklist-removal cases. */
  def pathFeatures(toks: IndexedSeq[Token], arcs: Array[Arc],
                   eb: Int, ee: Int, sb: Int, se: Int): Seq[String] =
    pathFeatures(toks, new Forest(arcs), eb, ee, sb, se)

  def pathFeatures(toks: IndexedSeq[Token], fr: Forest,
                   eb: Int, ee: Int, sb: Int, se: Int): Seq[String] = {
    val h0 = headOf(toks, eb, ee)
    val h1 = headOf(toks, sb, se)
    val steps = path(fr, h0, h1)
    if (steps.isEmpty) return Nil
    val f = Seq.newBuilder[String]
    val low = steps.map(_._2)
    val gen = low.map { s =>
      if (s.endsWith("->")) generalize(s.dropRight(2)) + "->"
      else "<-" + generalize(s.drop(2))
    }
    f += "dep_path=" + gen.mkString(" ")
    f += "dep_path_lowlevel=" + low.mkString(" ")
    // dependency_paths_to_verb: for each verb ON the path (not an arg
    // head), the generalized path from each arg to the verb + its lemma
    val onPath = steps.map(_._1).filterNot(i => i == h0 || i == h1)
    onPath.filter(i => toks(i).pos.startsWith("VB")).foreach { v =>
      val lemma = toks(v).word.toLowerCase
      val p0 = path(fr, h0, v).map(_._2).map(s =>
        if (s.endsWith("->")) generalize(s.dropRight(2)) + "->"
        else "<-" + generalize(s.drop(2))).mkString(" ")
      val p1 = path(fr, v, h1).map(_._2).map(s =>
        if (s.endsWith("->")) generalize(s.dropRight(2)) + "->"
        else "<-" + generalize(s.drop(2))).mkString(" ")
      f += s"dep_verb_l=$p0 $lemma"
      f += s"dep_verb_r=$lemma $p1"
      f += s"dep_verb=$p0 $lemma $p1"
    }
    f.result()
  }
}
