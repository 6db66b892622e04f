package graft

import org.scalatest.funsuite.AnyFunSuite

/** In-suite gates for the oracle-checked graph/eval driver queries
 *  (q28 closure, q29 Horn rules, q32 connected components, q33 P/R
 *  sweep) — closed-form expectations on the sf0.001 supplier keys
 *  (0..9), independent of the DuckDB harness. */
class GraphQuerySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def rows(name: String): Seq[(Long, String, Long, Double)] =
    SparkEntry.queries(name)(spark, dir).collect().toSeq.map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))

  test("q28 closure contains the exact 2- and 3-hop path products") {
    val c = rows("q28_graph_closure")
    // subsidiary tree 1 -> 2 -> 4 -> 8, each hop 0.5
    assert(c.contains((1L, "org:subsidiaries", 4L, 0.25)))
    assert(c.contains((1L, "org:subsidiaries", 8L, 0.125)))
    // member chain 0 -> 1 -> 2 -> 3 with parity scores 0.5, 0.25, 0.5
    assert(c.contains((0L, "org:member_of", 2L, 0.125)))
    assert(c.contains((0L, "org:member_of", 3L, 0.0625)))
    // depth bound: no 4-hop edge (1 -> 2 -> 4 -> 8 -> 16 needs key 16)
    assert(!c.exists(r => r._1 == 1L && r._3 == 16L))
  }

  test("q29 Horn rules lift an employee to the parent org, first-depth wins") {
    val c = rows("q29_graph_rules")
    // subsid(1,2)=0.5 ∧ emp(2,100002)=0.25, weight 0.25 -> 0.03125
    assert(c.contains((1L, "org:top_members/employees", 100002L, 0.03125)))
    // 2-hop derived subsidiary: (0.5*0.5)*0.5
    assert(c.contains((1L, "org:subsidiaries", 4L, 0.125)))
    // anti-join keeps the base row for triples the rules re-derive
    val base = c.filter(r =>
      r._1 == 1L && r._2 == "org:subsidiaries" && r._3 == 2L)
    assert(base == Seq((1L, "org:subsidiaries", 2L, 0.5)))
  }

  test("q32 labels every vertex with its component's minimum key") {
    val c = SparkEntry.queries("q32_graph_cc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // keys 0..9 are one decade: chain + spoke connect all of them, and
    // the fixpoint label is the decade minimum (0) for every vertex
    assert(c.map(_._1).sorted == (0L to 9L))
    assert(c.forall(_._2 == 0L))
  }

  test("q33 sweep is a valid monotone P/R curve") {
    val c = SparkEntry.queries("q33_pr_sweep")(spark, dir).collect().toSeq
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(c.nonEmpty && c.length <= 11) // one row per 0.1 bucket
    // thresholds ascend; responses, correct and recall never increase
    assert(c.map(_._1) == c.map(_._1).sorted)
    assert(c.map(_._2).reverse == c.map(_._2).reverse.sorted)
    assert(c.map(_._3).reverse == c.map(_._3).reverse.sorted)
    assert(c.map(_._4).reverse == c.map(_._4).reverse.sorted)
    // every bucket: correct <= responses (precision <= 1)
    assert(c.forall(r => r._3 <= r._2))
  }

  test("triangle counts: degree-oriented enumeration equals brute force") {
    import spark.implicits._
    // K4 on {0,1,2,3} (4 triangles, each vertex in 3), plus a pendant
    // vertex 4, a duplicate + reversed edge and a self-loop that must
    // all collapse
    val edges = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (1L, 0L), (0L, 1L), (4L, 3L), (2L, 2L)
    ).toDF("src", "dst")
    val got = graft.link.GraphOps.triangleCounts(spark, edges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0L) == ((3L, 3L)))
    assert(got(1L) == ((3L, 3L)))
    assert(got(2L) == ((3L, 3L)))
    assert(got(3L) == ((4L, 3L)))
    assert(got(4L) == ((1L, 0L)))
    // equal-degree orientation ties break by id: still every triangle once
    val tri = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
    val t3 = graft.link.GraphOps.triangleCounts(spark, tri).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(t3 == Set((2L, 1L)))
  }

  test("pagerank: integer recurrence matches hand computation per iteration") {
    import spark.implicits._
    // 0->1, 1->0, 1->2; 2 dangling; plus a self-loop and a duplicate
    // edge that must collapse. scale=100, d=85/100:
    //   iter1: to 1 from 0 = (100*85) div 100 = 85  -> 15+85 = 100
    //          to 0,2 from 1 = (100*85) div 200 = 42 -> 15+42 = 57
    //   iter2: to 1 from 0 = (57*85) div 100 = 48   -> 15+48 = 63
    //          to 0,2 from 1 (rank 100) = 42        -> 57
    val edges = Seq((0L, 1L), (1L, 0L), (1L, 2L), (0L, 0L), (0L, 1L))
      .toDF("src", "dst")
    def ranks(iters: Int) =
      graft.link.GraphOps.pageRank(spark, edges, iters = iters, scale = 100L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(1) == Map(0L -> 57L, 1L -> 100L, 2L -> 57L))
    assert(ranks(2) == Map(0L -> 57L, 1L -> 63L, 2L -> 57L))
  }

  test("k-core peeling: K5 core survives, pendant star cascades out over rounds") {
    val s = spark
    import s.implicits._
    // K5 on 1..5; 6 hangs off 5 with three leaves 7/8/9 (deg0 = 4, but its
    // degree depends on the leaves): round 1 peels the leaves, round 2
    // peels 6 — a genuine multi-round cascade. A self-loop and a reversed
    // duplicate must collapse before degrees are counted.
    val k5 = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i.toLong, j.toLong)
    val edges = (k5 ++ Seq((5L, 6L), (6L, 7L), (6L, 8L), (6L, 9L),
      (1L, 1L), (2L, 1L))).toDF("src", "dst")
    val got = graft.link.GraphOps.kCore(s, edges, k = 4, rounds = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    for (v <- 1L to 4L) assert(got(v) == ((4L, 4L, true)), s"node $v")
    assert(got(5L) == ((5L, 4L, true)))
    // 6 survives round 1 (deg0 = 4) but its leaves died with it
    assert(got(6L) == ((4L, 0L, false)))
    for (v <- 7L to 9L) assert(got(v) == ((1L, 0L, false)), s"node $v")
  }

  test("bfsDepth: minimal layers, cycles ignored, cutoff and early stop") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // 1→2→3→4→5→6 chain with a shortcut 1→4, a back-edge 4→1 (cycle),
    // and an island 9→10
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 4L), (4L, 1L), (9L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = graft.link.GraphOps.bfsDepth(spark, edges, seeds, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // shortcut wins for 4 (depth 1, not 3) and pulls 6 in at exactly the
    // depth-3 cutoff (chain-only it would sit at 5 and be excluded);
    // the island is unreachable; the 4→1 back-edge never relabels 1
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 5L -> 2L,
      6L -> 3L))
    // early stop: a graph exhausted before maxDepth terminates
    val tiny = graft.link.GraphOps.bfsDepth(spark,
      Seq((1L, 2L)).toDF("src", "dst"), seeds, maxDepth = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tiny == Map(1L -> 0L, 2L -> 1L))
  }
}
