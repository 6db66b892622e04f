package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.consistency.Consistency
import graft.model.{NER, Provenance, SlotFill}

/** Hot-entity (Zipf-skew) fixture promised by FIXTURES.md §1: one subject
 *  carrying tens of thousands of fills must flow through the per-entity
 *  consistency pass as a LINEAR task — the round-1 implementation was
 *  O(n²) accumulator scans and a 50k-fill subject would be a multi-minute
 *  straggler; this spec hangs rather than passes if that regresses. */
class SkewSpec extends AnyFunSuite {

  private val prov = Provenance("d", "u", 0, 0, 1, 2, 3)

  test("50k-fill hot subject: linear entityPass, argmax + dedup intact") {
    val listFills = (0 until 50000).map(k =>
      SlotFill("Hot Person", NER.PERSON, "per:cities_of_residence",
        s"Ville$k", NER.CITY, 0.9 - k * 1e-8, prov))
    // 5k conflicting SINGLE-cardinality fills -> exactly one survives
    val singleFills = (0 until 5000).map(k =>
      SlotFill("Hot Person", NER.PERSON, "per:date_of_birth",
        f"${1900 + k % 100}%04d-01-02", NER.DATE, 0.5 + k * 1e-8, prov))
    // exact duplicates -> collapse to one each
    val dups = (0 until 5000).map(k =>
      SlotFill("Hot Person", NER.PERSON, "per:title", "engineer",
        NER.TITLE, 0.4 + k * 1e-8, prov))
    val t0 = System.nanoTime()
    val out = Consistency.entityPass(listFills ++ singleFills ++ dups)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.count(_.pred == "per:date_of_birth") == 1)
    assert(out.count(_.pred == "per:title") == 1)
    assert(out.count(_.pred == "per:cities_of_residence") == 50000)
    // X15 kept the best-scoring SINGLE fill
    val dob = out.find(_.pred == "per:date_of_birth").get
    assert(dob.score == singleFills.map(_.score).max)
    // linear pass: generous bound for a noisy VM, but far below the
    // minutes an O(n²) pass would take
    assert(sec < 60.0, s"entityPass took $sec s on 60k fills")
  }

  test("Zipf-hot slot value: 'United States' in ~30% of pages (FIXTURES §1)") {
    // the promised skewed variant: one hot entity as slot value across a
    // third of the corpus — exercises the bag-agg / linking key paths
    // under value skew (no per-obj shuffle key exists, so the hot value
    // must NOT concentrate into one task anywhere)
    val spark = SparkTestSession.spark
    import spark.implicits._
    val n = 900
    val pages = (0 until n).map { i =>
      val p = graft.fixtures.PageGen.person(i)
      val where = if (i % 3 == 0) "United States"
        else Seq("France", "Germany", "Japan")(i % 3 - 1)
      graft.model.Page(s"https://z.example/$i",
        new java.sql.Timestamp(1700000000000L + i),
        Array.emptyByteArray, s"$p lives in $where.", "en")
    }
    val triples = graft.pipeline.KGPipeline.run(spark,
      spark.createDataset(pages)).collect()
    val us = triples.filter(t => t.pred == "per:countries_of_residence" &&
      t.obj == "United States")
    assert(us.length == n / 3, s"expected ${n / 3} hot fills, got ${us.length}")
    assert(us.map(_.subj).distinct.length == n / 3)
  }

  test("10^6 exact-duplicate fills on one subject: streaming pre-merge, bounded heap") {
    // post-linking alias pile-up shape: ONE canonical subject receives a
    // million rows that are exact (pred, obj) duplicates differing only in
    // score/provenance. The consistency shuffle must pre-merge duplicate
    // runs while streaming (heap = distinct fills), not buffer the raw
    // group; the surviving fill is the X13 argmax (max score).
    val spark = SparkTestSession.spark
    import spark.implicits._
    val n = 1000000
    val fills = spark.range(n).map { i =>
      SlotFill("Dup Person", NER.PERSON, "per:title", "engineer", NER.TITLE,
        0.3 + (i % 100) * 1e-6,
        Provenance(s"d${i % 7}", "u", (i % 11).toInt, 0, 1, 2, 3))
    }
    val t0 = System.nanoTime()
    val out = graft.pipeline.KGPipeline.consistentTriples(spark, fills).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.length == 1)
    assert(math.abs(out.head.score - (0.3 + 99 * 1e-6)) < 1e-9,
      s"expected the max-score duplicate to survive, got ${out.head.score}")
    assert(sec < 120.0, s"1M-duplicate subject took $sec s")
  }

  test("hot subject flows through the distributed consistency stage") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val fills = ((0 until 5000).map(k =>
      SlotFill("Hot Person", NER.PERSON, "per:cities_of_residence",
        s"Ville$k", NER.CITY, 0.9, prov)) :+
      SlotFill("Cold Person", NER.PERSON, "per:title", "engineer",
        NER.TITLE, 0.9, prov)).toDS()
    val out = graft.pipeline.KGPipeline.consistent(spark, fills)
    assert(out.count() == 5001)
  }

  test("10k identical docs: dedup clusters stay linear, one cluster, one keeper") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // a template-heavy crawl's worst case: every doc hashes to the same
    // bands. Star edges keep the candidate set LINEAR (n-1 edges, not
    // n²/2 pairs) and the election keeps exactly one doc
    val docs = (0L until 10000L)
      .map(i => (i, "boilerplate cookie banner page"))
      .toDF("doc_id", "text")
    val edges = graft.dedup.NearDup.minhashStarEdges(spark, docs)
    assert(edges.count() == 9999) // member->rep only, never all pairs
    val out = graft.dedup.NearDup.dedupClusters(spark, docs)
    assert(out.count() == 10000)
    assert(out.filter($"keep").count() == 1)
    assert(out.select("cluster").distinct().count() == 1)
    assert(out.filter($"keep").select("doc_id").head().getLong(0) == 0L)
  }

  test("10k-doc shared boilerplate span: dupSpans stays keyed and linear") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // every doc carries the same 8-token boilerplate plus a unique tail:
    // the hot gram is ONE counter row (count=10k), never a pairs blowup
    val docs = (0L until 10000L)
      .map(i => (i, s"all rights reserved terms of service apply now unique$i tail$i"))
      .toDF("doc_id", "text")
    val out = graft.dedup.NearDup.dupSpans(spark, docs, n = 8)
    assert(out.count() == 10000)
    // 10 tokens -> 3 gram positions; exactly the first (the full
    // boilerplate window) is corpus-duplicated
    val r = out.filter($"doc_id" === 7L).head()
    assert(r.getLong(1) == 3L && r.getLong(2) == 1L)
    assert(out.filter($"flagged").count() == 0) // 1/3 < 0.5
  }

  test("10^4-leaf hub: kCore peels the star in one round, no neighbor pairing") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // one hub with 10k leaves plus a K5 core the hub belongs to: the
    // leaves all peel in round 1 (deg 1), the hub keeps its K5 edges —
    // per round the hub costs one filter row, never a 10k² enumeration
    val k5 = for (i <- 0 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong)
    val star = (100L until 10100L).map(l => (0L, l))
    val edges = (k5 ++ star).toDF("src", "dst")
    val got = graft.link.GraphOps.kCore(spark, edges, k = 4, rounds = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(got(0L) == ((10004L, 4L, true)))
    for (v <- 1L to 4L) assert(got(v) == ((4L, 4L, true)))
    assert(got(100L) == ((1L, 0L, false)))
    assert(got.size == 10005)
  }

  test("hot stopword: bigramNextWords window sees successors, not occurrences") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // 'the' precedes 10k tokens but only 3 distinct successors survive the
    // prune — the rank window's partition holds 3 rows, not 10k
    val docs = (0L until 10000L)
      .map(i => (i, s"the ${Seq("cat", "dog", "fox")(i.toInt % 3)}"))
      .toDF("doc_id", "text")
    val got = graft.text.TextStats.bigramNextWords(docs, topK = 2, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    // counts: cat 3334 (i%3==0 for 0..9999), dog 3333, fox 3333; top-2 =
    // cat then dog (tie dog < fox)
    assert(got == Set(("the", "cat", 3334L, 1), ("the", "dog", 3333L, 2)))
  }

  test("10k-doc universal line: lineDedup drops it everywhere, stays linear") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = (0L until 10000L)
      .map(i => (i, s"COOKIE BANNER\nbody $i"))
      .toDF("doc_id", "text")
    val out = graft.text.Curation.lineDedup(docs, minDocs = 100)
    assert(out.count() == 10000)
    val r = out.filter($"doc_id" === 42L).head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 1L &&
      r.getString(3) == "body 42")
  }

  test("10k-page single host: boilerplate mining stays keyed and linear") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // one hot host carrying every page (the worst per-host skew) plus a
    // page-repeated nav line: the count shuffle is keyed (host, md5) so
    // the hot host fans out across line hashes, never one reducer row
    // per page; within-page repeats vote once
    val pages = (0L until 10000L)
      .map(i => (s"https://hot.com/p$i", s"NAV\nNAV\npromo ${i % 2}\nbody $i"))
      .toDF("url", "text")
    val mined = graft.text.Curation.hostBoilerplate(pages)
    val got = mined.collect()
      .map(r => (r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("NAV", 10000L), ("promo 0", 5000L),
      ("promo 1", 5000L)))
    val cleaned = graft.text.Curation.stripBoilerplate(pages, mined)
    val r = cleaned.filter($"url" === "https://hot.com/p42").head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 1L &&
      r.getString(3) == "body 42")
  }
}
