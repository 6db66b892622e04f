package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.link.Linker
import graft.model.NER

class LinkerSpec extends AnyFunSuite {

  test("blocking keys: normalized, acronym, surname") {
    val keys = Linker.blockKeys("John Smith", NER.PERSON)
    assert(keys.contains("n:PERSON:john smith"))
    assert(keys.contains("s:PERSON:smith"))
    val orgKeys = Linker.blockKeys("Global Dynamics Corp.", NER.ORGANIZATION)
    assert(orgKeys.contains("n:ORGANIZATION:global dynamics"))
    assert(orgKeys.exists(_.startsWith("a:ORGANIZATION:gdc")))
    val acr = Linker.blockKeys("GDC", NER.ORGANIZATION)
    assert(acr.contains("a:ORGANIZATION:gdc")) // shares the acronym block
  }

  test("sameEntity: suffix-stripped equality, acronym, containment") {
    assert(Linker.sameEntity("Acme Corp.", "Acme"))
    assert(Linker.sameEntity("GDC", "Global Dynamics Corp"))
    assert(Linker.sameEntity("Smith", "John Smith"))
    assert(!Linker.sameEntity("John Smith", "John Davis"))
    assert(!Linker.sameEntity("Global Dynamics Group",
      "Global Dynamics Holdings"))
  }

  private lazy val spark = SparkTestSession.spark
  private val prov = graft.model.Provenance("d", "u", 0, 0, 1, 2, 3)
  private def fill(subj: String) = graft.model.SlotFill(subj,
    NER.PERSON, "per:title", "engineer", NER.TITLE, 0.9, prov)

  test("hot blocks (>MaxBlock members) still link via salted sub-blocks") {
    // 300 distinct people share the surname blocking key s:PERSON:smith —
    // well beyond MaxBlock — plus one true alias pair inside the hot block.
    // Round-1 behavior (silent drop of blocks >256) would lose the pair.
    import spark.implicits._
    val crowd = (0 until 300).map(i => fill(f"Name$i%03d Smith"))
    val fills = (crowd :+ fill("John Smith") :+ fill("John R. Smith")).toDS()
    val alias = Linker.buildAliasMap(spark, fills)
    assert(alias == Map("John Smith" -> "John R. Smith"),
      s"hot block mis-linked: $alias")
  }

  test("buildAliasMap refuses above the MaxDriverAliasPairs gate") {
    import spark.implicits._
    val fills = Seq(fill("John Smith"), fill("John R. Smith")).toDS()
    val saved = Linker.MaxDriverAliasPairs
    try {
      Linker.MaxDriverAliasPairs = 0L // any pair is now "oversized"
      val e = intercept[IllegalArgumentException] {
        Linker.buildAliasMap(spark, fills)
      }
      assert(e.getMessage.contains("canonicalize"),
        s"refusal should redirect to canonicalize: ${e.getMessage}")
    } finally Linker.MaxDriverAliasPairs = saved
    // under the gate the same input still resolves on the driver path
    assert(Linker.buildAliasMap(spark, fills) ==
      Map("John Smith" -> "John R. Smith"))
  }

  test("distributed CC path canonicalizes identically to driver union-find") {
    // force the connected-components + shuffle-join path by dropping the
    // broadcast-safe threshold to zero, and check the rewrite matches the
    // driver path exactly (same components, same maximal-surface reps)
    import spark.implicits._
    def orgFill(subj: String) = graft.model.SlotFill(subj,
      NER.ORGANIZATION, "org:founded", "1990-XX-XX", "DATE", 0.9, prov)
    val fills = Seq(orgFill("GDC"), orgFill("Global Dynamics Corp"),
      orgFill("Global Dynamics"), orgFill("Acme Inc"), orgFill("Acme")).toDS()
    def run(): Seq[(String, Boolean)] = {
      val out = Linker.canonicalize(spark, fills)
        .collect().map(_.subj).sorted.toSeq
      val path = Linker.lastDistributed
      spark.sharedState.cacheManager.clearCache()
      out.map(s => (s, path))
    }
    val viaDriver = run()
    assert(!viaDriver.head._2, "expected the driver path by default")
    val saved = Linker.MaxDriverAliasPairs
    try {
      Linker.MaxDriverAliasPairs = 0L
      val viaCC = run()
      assert(viaCC.head._2, "expected the distributed path under threshold 0")
      assert(viaCC.map(_._1) == viaDriver.map(_._1),
        s"paths disagree: ${viaCC.map(_._1)} vs ${viaDriver.map(_._1)}")
      assert(viaCC.map(_._1) ==
        Seq("Acme Inc", "Acme Inc", "Global Dynamics Corp",
          "Global Dynamics Corp", "Global Dynamics Corp"))
    } finally Linker.MaxDriverAliasPairs = saved
  }

  test("canonicalize + release leaves no cached blocks (bare library caller)") {
    import spark.implicits._
    def orgFill(subj: String) = graft.model.SlotFill(subj,
      NER.ORGANIZATION, "org:founded", "1990-XX-XX", "DATE", 0.9, prov)
    val fills = Seq(orgFill("Acme Inc"), orgFill("Acme"),
      orgFill("Vertex Robotics Ltd."), orgFill("Vertex Robotics")).toDS()
    // The suite shares one SparkSession with concurrently-running suites
    // (e.g. DedupSpec's NearDup localCheckpoints, which clearCache() cannot
    // touch and which legitimately live across our window), so a global
    // getPersistentRDDs.isEmpty is unsound here. Scope the leak check to
    // blocks ATTRIBUTED to this path: a leaked Linker cache is materialized
    // by our collect(), so its block's creation site names Linker(Spec).
    def linkerBlocks = spark.sparkContext.getPersistentRDDs.values
      .filter(_.toString.contains("Linker"))
    def checkPath(): Unit = {
      val out = Linker.canonicalize(spark, fills)
      assert(out.collect().nonEmpty) // materialize, as the contract requires
      assert(linkerBlocks.nonEmpty, // the scoping must SEE the cache first,
        "expected the linker's persisted blocks before release " +
          "(callSite attribution changed? widen the filter)")
      Linker.release()
      assert(linkerBlocks.isEmpty,
        s"persistent RDD blocks survived canonicalize + release: " +
          linkerBlocks.mkString(", "))
    }
    checkPath() // driver union-find path
    val saved = Linker.MaxDriverAliasPairs
    try { Linker.MaxDriverAliasPairs = 0L; checkPath() } // distributed path
    finally Linker.MaxDriverAliasPairs = saved
  }

  test("union-find reaches the transitive fixpoint across blocks") {
    // GDC -(acronym block)-> Global Dynamics Corp -(normalized block)->
    // Global Dynamics: all three must collapse to ONE maximal-surface rep
    // even though no single block contains all of them
    import spark.implicits._
    def orgFill(subj: String) = graft.model.SlotFill(subj,
      NER.ORGANIZATION, "org:founded", "1990-XX-XX", "DATE", 0.9, prov)
    val fills = Seq(orgFill("GDC"), orgFill("Global Dynamics Corp"),
      orgFill("Global Dynamics")).toDS()
    val alias = Linker.buildAliasMap(spark, fills)
    assert(alias == Map(
      "GDC" -> "Global Dynamics Corp",
      "Global Dynamics" -> "Global Dynamics Corp"), s"chain not closed: $alias")
  }
}
