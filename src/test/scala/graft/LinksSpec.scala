package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.PageGen
import graft.text.Links

/** Hyperlink extraction + anchor-text alias mining over the planted
  * corpus web graph (PageGen's <nav> footer). The extracted edge set must
  * be EXACTLY the planted one; the alias miner must recover the
  * (last-name → full-name) anchor pairs per hub; extraction itself must
  * stay shuffle-free (it fuses into the scan at crawl scale). */
class LinksSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val n = 60
  private lazy val pages = {
    val (ps, _) = PageGen.corpus(n)
    spark.createDataset(ps).toDF()
  }
  private lazy val links = Links.extractLinks(pages)

  test("extractLinks recovers exactly the planted nav edges (binary html)") {
    val got = links.select("src_url", "dst_url", "anchor").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val want = (0 until n).flatMap { i =>
      val src = s"https://site-${i % 97}.example/page-$i"
      val hub = PageGen.hubOf(i)
      val hubName = PageGen.hubEntity(i)
      val hubAnchor =
        if (i % 3 == 0) PageGen.lastName(hubName) else hubName
      Seq(
        (src, src, "top"), // root-relative self link, resolved + canonical
        (src, s"https://site-${hub % 97}.example/page-$hub", hubAnchor),
        (src, s"https://site-${(i + 1) % 97}.example/page-${i + 1}",
          PageGen.person(i + 3))) ++
        // mailto: planted on every 5th page must NOT appear; the
        // directory-relative archive link resolves against the src dir
        (if (i % 4 == 0)
          Seq((src, s"https://site-${i % 97}.example/archive-${i % 8}.html",
            "archive"))
        else Nil)
    }.toSet
    assert(got == want)
    // mailto never survives the https?:// keep-filter
    assert(links.filter(col("href").startsWith("mailto:")).count() == 0)
  }

  test("extraction is shuffle-free: no Exchange in the physical plan") {
    val plan = links.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("aliasPairs mines (last-name -> full-name) anchor evidence per hub") {
    val got = Links.aliasPairs(links, k = 5, minCount = 2)
      .select("alias", "canonical").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // every full hub (10 linking pages) has full-name anchors on ~2/3 of
    // its in-links and last-name anchors on the rest — the miner must
    // emit (last, full) for each, and never the reverse
    val hubs = (0 until n).map(PageGen.hubOf).distinct.filter(_ + 9 < n)
    assert(hubs.nonEmpty)
    hubs.foreach { h =>
      val full = PageGen.hubEntity(h)
      val last = PageGen.lastName(full)
      assert(got.contains((last, full)), s"missing alias for hub $h")
      assert(!got.contains((full, last)), s"reversed alias for hub $h")
    }
  }

  test("anchorStats ranks by (count desc, anchor asc) with per-dst totals") {
    val stats = Links.anchorStats(links, k = 5)
    val hub0 = stats
      .filter(col("dst_url") === "https://site-0.example/page-0")
      .orderBy(col("rank")).collect()
    val full = PageGen.hubEntity(0)
    // pages 0..9 link the hub; i%3==0 (0,3,6,9) use the last name
    assert(hub0.head.getAs[String]("anchor") == full)
    assert(hub0.head.getAs[Long]("n") == 6L)
    assert(hub0(1).getAs[String]("anchor") == PageGen.lastName(full))
    assert(hub0(1).getAs[Long]("n") == 4L)
    // third anchor: page-0's own root-relative "top" self-link
    assert(hub0.length == 3 && hub0(2).getAs[String]("anchor") == "top")
    // 11 distinct linking pages total (10 hub links + the self link)
    assert(hub0.map(_.getAs[Long]("n_srcs")).toSet == Set(11L))
  }

  test("hostGraph equals a local recount; self-links flagged internal") {
    def host(u: String) = u.stripPrefix("https://").takeWhile(_ != '/')
    val edges = links.select("src_url", "dst_url").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = edges.groupBy { case (s, d) => (host(s), host(d)) }
      .map { case ((sh, dh), es) =>
        (sh, dh, es.length.toLong, es.map(_._1).distinct.length.toLong,
          sh == dh)
      }.toSet
    val got = Links.hostGraph(links).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(got == want)
    // planted self-links guarantee internal rows exist, hub links external
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("frontier: uncrawled only, ranked (refs desc, url asc), exact top-k") {
    val crawledDf = pages.select(col("url"))
    val got = Links.frontier(links, crawledDf, k = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val crawledSet =
      (0 until n).map(i => s"https://site-${i % 97}.example/page-$i").toSet
    val edges = links.select("src_url", "dst_url").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = edges.filter(e => !crawledSet(e._2)).groupBy(_._2)
      .map { case (d, es) =>
        (d, es.map(_._1).distinct.length.toLong, es.length.toLong)
      }.toSeq.sortBy { case (d, refs, _) => (-refs, d) }.take(5)
    assert(got == want)
    assert(got.nonEmpty && got.forall(g => !crawledSet(g._1)))
  }

  test("urlTemplates: digit runs collapse, counts and min-url example") {
    val u = Seq(
      "https://a.com/item/12?page=3", "https://a.com/item/9?page=41",
      "https://a.com/about", "https://b.com/item/5?page=1"
    ).toDF("url")
    val got = Links.urlTemplates(u).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(got == Set(
      ("a.com", "/item/{N}?page={N}", 2L, "https://a.com/item/12?page=3"),
      ("a.com", "/about", 1L, "https://a.com/about"),
      ("b.com", "/item/{N}?page={N}", 1L, "https://b.com/item/5?page=1")))
  }

  test("applyUrlRules: longest prefix wins, disallow on ties, default allow") {
    val urls = Seq(
      "https://x.com/a/1/deep", // /a deny vs /a/1 allow -> allow (longer)
      "https://x.com/a/2",      // only /a matches -> deny
      "https://x.com/c",        // host matches, no prefix -> default allow
      "https://y.com/a/1",      // tie: /a/1 allow vs /a/1 deny -> DENY
      "https://z.com/a/1"       // no rules for host -> default allow
    ).toDF("url")
    val rules = Seq(
      ("x.com", "/a", false), ("x.com", "/a/1", true),
      ("y.com", "/a/1", true), ("y.com", "/a/1", false))
      .toDF("host", "path_prefix", "allow")
    val got = Links.applyUrlRules(urls, rules).collect()
      .map(r => r.getString(0) ->
        ((Option(r.getString(1)), r.getBoolean(2)))).toMap
    assert(got("https://x.com/a/1/deep") == ((Some("/a/1"), true)))
    assert(got("https://x.com/a/2") == ((Some("/a"), false)))
    assert(got("https://x.com/c") == ((None, true)))
    assert(got("https://y.com/a/1") == ((Some("/a/1"), false)))
    assert(got("https://z.com/a/1") == ((None, true)))
  }

  test("crawlBudget: exact Hamilton apportionment, sums to the budget") {
    val demand = Seq(("h1", 5L), ("h2", 3L), ("h3", 2L), ("h4", 1L))
      .toDF("host", "demand")
    // budget 7, total 11: floors 3,1,1,0 (sum 5), remainders 2,10,3,7
    // -> +1 to h2 (10) and h4 (7)
    val got = Links.crawlBudget(demand, 7L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == Map("h1" -> 3L, "h2" -> 2L, "h3" -> 1L, "h4" -> 1L))
    assert(got.values.sum == 7L)
    // budget >= total: everyone gets exactly their demand
    val all = Links.crawlBudget(demand, 100L).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(all == Map("h1" -> 5L, "h2" -> 3L, "h3" -> 2L, "h4" -> 1L))
  }

  test("clusterPairMetrics equals brute-force pair enumeration") {
    val ids = (0 until 60).map(i => (i.toLong, i % 7, i % 9))
    val df = ids.toDF("id", "pred_cluster", "gold_cluster")
    val row = graft.link.GraphOps.clusterPairMetrics(df).collect()(0)
    val pairs = for {
      a <- ids; b <- ids if a._1 < b._1
    } yield (a._2 == b._2, a._3 == b._3)
    val tp = pairs.count(p => p._1 && p._2).toLong
    val pp = pairs.count(_._1).toLong
    val gp = pairs.count(_._2).toLong
    assert((row.getLong(0), row.getLong(1), row.getLong(2)) == ((tp, pp, gp)))
    assert(row.getDouble(3) ==
      BigDecimal(tp.toDouble / pp).setScale(12,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
