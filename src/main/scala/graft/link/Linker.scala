package graft.link

import org.apache.spark.sql.{Column, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{NER, SlotFill}
import graft.nlp.Coref

/**
 * Entity linking & canonicalization (the EntityMergingPostProcessor, G2 —
 * evaluate/GraphConsistencyPostProcessors.java:51-129; pairwise match
 * semantics from entitylinking/EntityLinker.java:80-175 "GaborsHackyBaseline":
 * acronym + token-overlap).
 *
 * Scale design (the skew-sensitive step per SURVEY.md §2.9):
 *  - NO all-pairs compare: names are exploded to BLOCKING KEYS (normalized
 *    token string, acronym key, surname key); only names sharing a key are
 *    compared.
 *  - within a block, GREEDY clustering against accumulated representatives
 *    (block sorted deterministically) — O(n·reps), not O(n²);
 *    a hot block ("united states") degrades gracefully because near-equal
 *    names collapse into one rep early.
 *  - cross-block agreement via iterative min-label propagation (connected
 *    components as joins, bounded iterations) — the standard large-scale CC
 *    pattern; per-entity graphs are tiny so it converges in 2-3 rounds.
 */
object Linker {

  private val corpSuffixes = Set("inc", "inc.", "corp", "corp.", "co",
    "co.", "ltd", "ltd.", "llc", "corporation", "company")

  /** Deterministic stable entity id from (type, canonical name) — codegen'd
   *  column expression, no UDF. */
  def idCol(name: Column, tpe: Column): Column =
    concat(lit("e:"), lower(substring(tpe, 1, 3)), lit(":"),
      md5(concat(tpe, lit("|"), name)))

  def normalizeName(n: String): String =
    n.split(" ").filterNot(t => corpSuffixes.contains(t.toLowerCase))
      .mkString(" ").toLowerCase.trim

  /** Blocking keys for a (name, type). */
  def blockKeys(name: String, tpe: String): Seq[String] = {
    val toks = name.split(" ").toSeq
    val norm = normalizeName(name)
    val keys = Seq.newBuilder[String]
    if (norm.nonEmpty) keys += s"n:$tpe:$norm"
    // acronym key: ABC and "Acme Business Corp" share key a:ORG:abc
    if (toks.length == 1 && name.forall(c => !c.isLower) && name.length >= 2
        && name.count(_.isLetter) >= 2)
      keys += s"a:$tpe:${name.filter(_.isLetter).toLowerCase}"
    else if (toks.length >= 2) {
      val initials = toks.filter(t => t.nonEmpty && t.charAt(0).isUpper)
        .map(_.charAt(0).toLower).mkString
      if (initials.length >= 2) keys += s"a:$tpe:$initials"
    }
    // surname key for persons ("John Smith" ~ "Smith")
    if (tpe == NER.PERSON && toks.nonEmpty)
      keys += s"s:$tpe:${toks.last.toLowerCase.stripSuffix(".")}"
    keys.result()
  }

  /** Pairwise same-entity test (exact-normalized | acronym | token subset
   *  with approximate token match). */
  def sameEntity(a: String, b: String): Boolean = {
    if (normalizeName(a) == normalizeName(b)) return true
    val ta = a.split(" ").toSeq
    val tb = b.split(" ").toSeq
    if (Coref.isAcronymOf(a, tb) || Coref.isAcronymOf(b, ta)) return true
    val (small, large) = if (ta.length <= tb.length) (ta, tb) else (tb, ta)
    small.nonEmpty && large.nonEmpty && small.length < large.length &&
      small.forall(s => large.exists(l => Coref.approxTokenMatch(s, l)))
  }

  /** name -> canonical name for all PER/ORG names in the fills. */
  def buildAliasMap(spark: SparkSession, fills: Dataset[SlotFill])
      : Dataset[(String, String)] = {
    import spark.implicits._
    val names = fills.flatMap { f =>
      Seq((f.subj, f.subj_type)) ++
        (if (NER.isEntityType(f.obj_type)) Seq((f.obj, f.obj_type)) else Nil)
    }.distinct()

    // explode to blocking keys, cluster greedily per block; PERSISTED —
    // the propagation loop below re-joins `pairs` every iteration and
    // without a persist each iteration would recompute the whole upstream
    // (including the NLP stage). Only NON-IDENTITY pairs are emitted: a
    // name with no row is its own canonical form, which keeps the
    // propagation join and the downstream broadcast proportional to the
    // number of actual aliases, not the entity universe.
    val maxBlock = 256 // hot-key guard: a blocking key shared by hundreds
    // of distinct entities (e.g. a popular acronym shape) is a weak signal
    // and would make the in-block greedy pass quadratic — skip it, the
    // frequency-capped-blocking-key standard at scale
    val pairs = names.flatMap { case (n, t) =>
      blockKeys(n, t).map(k => (k, n))
    }.groupByKey(_._1).flatMapGroups { (_, it) =>
      // deterministic order: longest first (representatives are maximal
      // surface forms), then lexicographic
      val members = it.map(_._2).toVector.distinct
        .sortBy(n => (-n.length, n))
      if (members.length > maxBlock) Iterator.empty
      else {
        val reps = scala.collection.mutable.ArrayBuffer[String]()
        members.iterator.flatMap { n =>
          reps.find(r => sameEntity(r, n)) match {
            case Some(r) => Some((n, r))
            case None => reps += n; None // identity: no row needed
          }
        }
      }
    }.toDF("name", "rep").persist()

    // connected components: min-label propagation, FIXED 2 rounds
    // (name -> min(rep), then propagate through the rep's own label —
    // name-linking chains deeper than rep-of-rep don't occur; no
    // per-iteration convergence count, each would be a full job).
    // A rep with no alias row of its own is its own label (left join +
    // coalesce). Deterministic by construction.
    var labels = pairs.groupBy($"name").agg(min($"rep").as("label"))
    var iter = 0
    while (iter < 2) {
      labels = pairs
        .join(labels.select($"name".as("rep"), $"label".as("repLabel")),
          Seq("rep"), "left")
        .groupBy($"name")
        .agg(min(coalesce($"repLabel", $"rep")).as("label"))
      iter += 1
    }
    // only true renames survive; persisted because canonicalize broadcasts
    // this map twice (subj + obj join)
    labels.filter($"name" =!= $"label").persist().as[(String, String)]
  }

  /** Rewrite subj/obj to canonical representatives. The alias map is small
   *  relative to the corpus (distinct entities), broadcast by AQE/hint. */
  def canonicalize(spark: SparkSession, fillsIn: Dataset[SlotFill])
      : Dataset[SlotFill] = {
    import spark.implicits._
    // consumed twice (alias-map build + rewrite join): persist to cut the
    // upstream (NLP -> bags -> consistency) to a single computation
    val fills = fillsIn.persist()
    val aliases = buildAliasMap(spark, fills).toDF("name", "canon")
    val f = fills.toDF()
    val withSubj = f.join(broadcast(aliases).withColumnRenamed("name", "subj")
        .withColumnRenamed("canon", "subj_canon"), Seq("subj"), "left")
    val withObj = withSubj.join(broadcast(aliases)
        .withColumnRenamed("name", "obj")
        .withColumnRenamed("canon", "obj_canon"), Seq("obj"), "left")
    withObj.select(
      coalesce($"subj_canon", $"subj").as("subj"),
      $"subj_type",
      $"pred",
      coalesce($"obj_canon", $"obj").as("obj"),
      $"obj_type",
      $"score",
      $"prov").as[SlotFill]
  }
}
