package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Curation

/** Curation ops: the two-phase stratified sampler must be EXACTLY the
  * single-window sample (any salt count), and the distributed prefix-sum
  * packer must be EXACTLY the global-window packing (any block size). */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val docs = (0L until 120L).map { i =>
    val lang = if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"
    // variable token counts: (i % 7) + 1 words
    (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" "), lang)
  }.toDF("doc_id", "text", "lang")

  test("stratified sample: exact top-k by md5 rank per stratum, salt-invariant") {
    val k = 5
    val got = Curation.stratifiedSample(docs, "lang", k, salts = 8)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // brute-force reference: k smallest (md5(id), id) per lang
    val want = (0L until 120L).groupBy(i =>
        if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr")
      .flatMap { case (lang, ids) =>
        ids.sortBy(i => (md5hex(i.toString), i)).take(k).map(i => (i, lang))
      }.toSet
    assert(got == want)
    assert(got.groupBy(_._2).forall(_._2.size == k))
    // a different salt count (including the degenerate 1) changes nothing
    val salt1 = Curation.stratifiedSample(docs, "lang", k, salts = 1)
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salt1 == want)
  }

  test("repetition signals: counts, fractions and the single-token guard") {
    val d = Seq(
      (0L, "a a a b"),                     // heavy word + bigram repeats
      (1L, "a b c d e f g h i j k"),       // all-distinct: passes the gate
      (2L, "a")                            // single token: no bigram slots
    ).toDF("doc_id", "text")
    val got = graft.text.TextStats.repetitionSignals(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r0 = got(0L)
    assert((r0.getLong(1), r0.getLong(2), r0.getLong(3), r0.getLong(4)) ==
      ((4L, 2L, 3L, 2L))) // tokens, distinct, top word "a"×3, top bigram "a a"×2
    assert(r0.getDouble(5) == 0.5 && r0.getDouble(6) == 0.75 &&
      r0.getDouble(7) == 2.0 / 3.0)
    assert(!r0.getBoolean(8)) // top_word_frac 0.75 > 0.3
    val r1 = got(1L)
    assert(r1.getLong(3) == 1L && r1.getDouble(5) == 0.0 &&
      r1.getDouble(7) == 0.1 && r1.getBoolean(8))
    val r2 = got(2L)
    assert(r2.getLong(1) == 1L && r2.isNullAt(4) && r2.isNullAt(7) &&
      !r2.getBoolean(8)) // top_word_frac 1.0 kills it; bigram leg vacuous
  }

  test("canonical url: case, default ports, www, tracking params, slashes") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/Path/?utm_source=a&x=1#frag",
      "http://site.com:8080/a",   // non-default port survives
      "http://site.com:80",       // default port + empty path
      "https://example.com/Path", // already canonical: fixpoint
      "http://host.com/p/?utm_campaign=z&fbclid=f", // query dies entirely
      "  not a url  "             // non-URL: trimmed passthrough
    ).toDF("url")
    val got = urls.select(Curation.canonicalUrl($"url").as("c"))
      .as[String].collect().toSeq
    assert(got == Seq(
      "https://example.com/Path?x=1",
      "http://site.com:8080/a",
      "http://site.com/",
      "https://example.com/Path",
      "http://host.com/p",
      "not a url"))
  }

  test("latest crawl: newest capture per canonical url, capture count kept") {
    val caps = Seq(
      (1L, "http://A.com/x", 10L),
      (2L, "http://a.com/x/", 20L),                 // same canonical, newest
      (3L, "http://a.com/x?utm_source=t", 15L),     // same canonical, older
      (4L, "http://b.com/y", 5L)
    ).toDF("doc_id", "url", "warc_ts")
    // output = canonical_url, <input cols>, n_crawls
    val got = Curation.latestCrawl(caps).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      ("http://a.com/x", 2L, 20L, 3L),
      ("http://b.com/y", 4L, 5L, 1L)))
  }

  test("contamination: distinct-shingle hits vs a benchmark set") {
    val d = Seq(
      (0L, "x y z w"),            // the benchmark doc (0 % 97 == 0)
      (1L, "a b c d e"),          // disjoint: clean
      (2L, "q x y z w r"),        // shares 2 of its 4 shingles
      (3L, "hi there"),           // < 3 tokens: no shingles at all
      (4L, "x y z x y z x y")     // in-doc duplicate shingles count once
    ).toDF("doc_id", "text")
    val got = graft.text.Curation.contamination(
        d, d.filter($"doc_id" % 97 === 0), n = 3).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toMap
    assert(got(0L) == ((2L, 2L, Some(1.0), true)))      // self-hit
    assert(got(1L) == ((3L, 0L, Some(0.0), false)))
    assert(got(2L) == ((4L, 2L, Some(0.5), true)))      // "x y z", "y z w"
    assert(got(3L) == ((0L, 0L, None, false)))
    assert(got(4L) == ((3L, 1L, Some(1.0 / 3.0), true))) // 6 slots, 3 distinct
  }

  test("salient terms: integer-exact rank by (tf desc, df asc, term asc)") {
    val d = Seq(
      (0L, "apple apple banana cherry"),   // tf: apple 2
      (1L, "banana banana cherry cherry date"), // tf tie banana/cherry 2
      (2L, "apple date date")
    ).toDF("doc_id", "text")
    val got = graft.text.TextStats.salientTerms(d, k = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(5))).toSet
    // df: apple 2, banana 2, cherry 2, date 2 — doc 1's tie between
    // banana(2)/cherry(2) breaks alphabetically
    assert(got == Set(
      (0L, "apple", 2L, 2L, 1), (0L, "banana", 1L, 2L, 2),
      (1L, "banana", 2L, 2L, 1), (1L, "cherry", 2L, 2L, 2),
      (2L, "date", 2L, 2L, 1), (2L, "apple", 1L, 2L, 2)))
    // tfidf column: tf * ln((N+1)/(df+1)) with N=3
    val row = graft.text.TextStats.salientTerms(d, k = 2)
      .filter($"doc_id" === 0L && $"term" === "apple").head()
    assert(math.abs(row.getDouble(4) - 2.0 * math.log(4.0 / 3.0)) < 1e-12)
  }

  test("shard packing: distributed prefix sum equals the global window, block-invariant") {
    val budget = 20L
    val got = Curation.packShards(spark, docs, budget, blockSize = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // reference: exclusive running sum in doc_id order
    var run = 0L
    val want = (0L until 120L).map { i =>
      val tok = (i % 7) + 1
      val shard = run / budget
      run += tok
      (i, tok, shard)
    }
    assert(got.toSeq == want)
    // a single block (the naive plan's semantics) gives identical shards
    val oneBlock = Curation.packShards(spark, docs, budget, blockSize = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(oneBlock.toSeq == want)
    // shards are contiguous and nondecreasing in doc order (a doc that
    // straddles a boundary stays in the shard its first token falls in,
    // so a shard may exceed budget by part of its last doc — by design)
    assert(got.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("shard packing: auto block sizing; hint only when provably small") {
    // sparse ids spanning 5·10^9: under the old fixed blockSize=1000
    // default this id range means a 5·10^6-row offset table that was
    // unconditionally broadcast-hinted; the auto path derives a block
    // size capping blocks at TargetPackBlocks
    val ids = Seq(0L, 3L, 999L, 1000000L, 2500000000L, 4999999999L)
    val wide = ids.map(i => (i, "a b c")).toDF("doc_id", "text")
    val auto = Curation.packShards(spark, wide, budget = 5L)
    val got = auto.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    var run = 0L
    val want = ids.map { i => val s = run / 5L; run += 3L; (i, s) }
    assert(got == want)
    // auto path: offset side is provably ≤ TargetPackBlocks → hinted
    assert(auto.queryExecution.analyzed.toString.contains("ResolvedHint"))
    // caller-chosen blockSize: size unknowable without a job → no hint,
    // AQE decides from runtime stats (old code hinted unconditionally)
    val explicit = Curation.packShards(spark, wide, budget = 5L,
      blockSize = 1000L)
    assert(!explicit.queryExecution.analyzed.toString
      .contains("ResolvedHint"))
    assert(explicit.collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
      == want)
  }

  test("pii: counts over original text, typed sequential redaction") {
    val d = Seq(
      (0L, "mail a.b+c@ex.co or x@y.io, call 800-555-1234, from 10.0.0.1"),
      (1L, "no pii here, just 1.2 version and a@b (not an email)"),
      (2L, "ip 999.1.2.3 over-matches by design; +123 456 7890 too")
    ).toDF("doc_id", "text")
    val got = Curation.piiSignals(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getBoolean(6), r.getString(4))).toMap
    assert(got(0L) == ((2L, 1L, 1L, 4L, true,
      "mail <EMAIL> or <EMAIL>, call <PHONE>, from <IP>")))
    assert(got(1L) == ((0L, 0L, 0L, 0L, false,
      "no pii here, just 1.2 version and a@b (not an email)")))
    // 999.1.2.3 matches (redactor over-matches toward safety);
    // "+123 456 7890" matches the NANP shape with space separators
    assert(got(2L)._3 == 1L && got(2L)._2 == 1L && got(2L)._5)
  }

  test("domain stats: host/domain normalization, two-level rollup, blocklist") {
    val d = Seq(
      (0L, "https://www.Shop.Example.com:8443/a", "one two three"),
      (1L, "http://cdn.example.com/b", "four"),
      (2L, "https://example.com/c?q=1", "five six"),
      (3L, "https://other.org/", "seven")
    ).toDF("doc_id", "url", "text")
    val got = Curation.domainStats(d.select($"url", $"text"),
        blocklist = Seq("example.com")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // hosts under example.com: shop.example.com (www+port stripped),
    // cdn.example.com, example.com — 3 hosts, 3+1+2 = 6 tokens total
    assert(got("example.com") == ((3L, 3L, 6L, true)))
    assert(got("other.org") == ((1L, 1L, 1L, false)))
  }

  test("vocabulary: top-k total order, exact cumulative coverage") {
    val d = Seq((0L, "a a b"), (1L, "b a  c")).toDF("doc_id", "text")
    // tokens: a×3, b×2, c×1 (the double space yields an empty token that
    // must be filtered); total 6
    val got = graft.text.TextStats.vocabulary(d, k = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1, "a", 3L, 3.0 / 6.0), (2, "b", 2L, 5.0 / 6.0)))
  }

  test("bigramNextWords: directional pairs, prune before rank, tie order") {
    val d = Seq((0L, "a b a b c"), (1L, "b c")).toDF("doc_id", "text")
    // pairs: (a,b)x2, (b,a)x1, (b,c)x2
    val got = graft.text.TextStats.bigramNextWords(d, topK = 3, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(got == Set(("a", "b", 2L, 1), ("b", "c", 2L, 1)))
    // at minCount 1 the pruned (b,a) reappears and ranks BELOW (b,c)
    val all = graft.text.TextStats.bigramNextWords(d, topK = 3, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(all == Set(("a", "b", 2L, 1), ("b", "c", 2L, 1), ("b", "a", 1L, 2)))
  }

  test("lengthQuantiles: exact ceil-rank percentiles from the length histogram") {
    // lengths 1..10, one doc each: p50 -> rank 5 -> len 5; p90 -> 9; p99 -> 10
    val d = (1 to 10).map(n => (n.toLong, Seq.fill(n)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = graft.text.TextStats.lengthQuantiles(d, qs = Seq(50, 90, 99))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((50, 5L), (90, 9L), (99, 10L)))
    // duplicated lengths: 4 docs of len 2, 1 of len 7 -> p50 rank 3 -> 2;
    // p99 rank ceil(4.95)=5 -> 7; empty tokens don't count
    val d2 = Seq((0L, "a a"), (1L, "a  a"), (2L, "a a"), (3L, "a a"),
      (4L, "a a a a a a a")).toDF("doc_id", "text")
    val got2 = graft.text.TextStats.lengthQuantiles(d2, qs = Seq(50, 99))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got2 == Seq((50, 2L), (99, 7L)))
  }

  test("searchAll: all-terms gate, tf rollup, duplicate query terms collapse") {
    val d = Seq(
      (0L, "join vector window join"), // all 3, join tf=2
      (1L, "join vector"),             // missing window -> dropped
      (2L, "window window vector join extra")
    ).toDF("doc_id", "text")
    val got = graft.text.Search.searchAll(d,
        Seq("vector", "join", "window", "join")) // dup term must not skew the gate
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set((0L, 3L, 4L, 1L), (2L, 3L, 4L, 1L)))
  }

  test("postings: one row per (word, doc) with tf, empties filtered") {
    val d = Seq((0L, "a b  a"), (1L, "b")).toDF("doc_id", "text")
    val got = graft.text.Search.postings(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("a", 0L, 2L), ("b", 0L, 1L), ("b", 1L, 1L)))
  }

  test("kmv sketch: kth hash is the k-th smallest distinct 48-bit md5 prefix") {
    val d = Seq((0L, "a b c d"), (1L, "b c d e")).toDF("doc_id", "text")
    val r = graft.text.Sketches.kmvDistinctWords(d, k = 3).head()
    // recompute the expected k-min directly
    val hs = Seq("a", "b", "c", "d", "e").map { w =>
      val m = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(m.substring(0, 12), 16)
    }.distinct.sorted
    assert(r.getLong(0) == 3L && r.getLong(1) == hs(2))
    assert(r.getDouble(2) == 2.0 * 281474976710656.0 / hs(2).toDouble)
    assert(r.getLong(3) == 5L)
  }

  test("cooccurrence: window-2 unordered pairs, canonical order, minCount") {
    val d = Seq((0L, "a b  a c"), (1L, "c a")).toDF("doc_id", "text")
    // doc0 tokens a,b,a,c (empty removed): off1 (a,b)(a,b)(a,c); off2 (a,a)(b,c)
    // doc1: off1 (a,c)
    val got = graft.text.TextStats.cooccurrence(d, window = 2, minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(("a", "b", 2L), ("a", "c", 2L), ("a", "a", 1L),
      ("b", "c", 1L)))
    val pruned = graft.text.TextStats.cooccurrence(d, window = 2, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pruned == Set(("a", "b", 2L), ("a", "c", 2L)))
  }

  test("sessionize: strict gap threshold, per-user sessions, tie-safe") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val d = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),
      (1L, 11L, ts("2026-01-01 10:10:00")),   // 10 min: same session
      (1L, 12L, ts("2026-01-01 10:45:00")),   // 35 min: breaks
      (1L, 13L, ts("2026-01-01 10:46:00")),
      (2L, 20L, ts("2026-01-01 09:00:00")),   // singleton
      (3L, 30L, ts("2026-01-01 08:00:00")),
      (3L, 31L, ts("2026-01-01 08:30:00"))    // exactly 30 min: NOT a break
    ).toDF("user_id", "event_id", "ts")
    val got = graft.ops.Sessions.sessionize(d, gapMinutes = 30).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
      .toSet
    assert(got == Set(
      (1L, 1L, 2L, 600L), (1L, 2L, 2L, 60L),
      (2L, 1L, 1L, 0L),
      (3L, 1L, 2L, 1800L)))
  }

  test("line dedup: >=minDocs lines drop, order kept, all-boiler doc empty") {
    val d = Seq(
      (0L, "boiler\nunique zero\nboiler2"),
      (1L, "boiler\nunique one\nboiler2"),
      (2L, "boiler\nboiler2"),
      (3L, "solo line")
    ).toDF("doc_id", "text")
    val got = Curation.lineDedup(d, minDocs = 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // "boiler" is in 3 docs (drops); "boiler2" in 3 docs (drops)
    assert(got(0L) == ((3L, 1L, "unique zero")))
    assert(got(1L) == ((3L, 1L, "unique one")))
    assert(got(2L) == ((2L, 0L, "")))
    assert(got(3L) == ((1L, 1L, "solo line")))
  }

  test("span dedup: first corpus-order occurrence kept, blanks survive") {
    val d = Seq(
      (0L, "shared quote\nzero body\n\ntail"),
      (1L, "one body\nshared quote\nshared quote"),
      (2L, "shared quote\n\ntwo body")
    ).toDF("doc_id", "text")
    val got = Curation.spanDedup(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    // doc 0 owns the first "shared quote" (doc_id 0, pos 0); later copies
    // drop — including the SAME-doc repeat inside doc 1; blank lines kept
    assert(got(0L) == ((4L, 4L, "shared quote\nzero body\n\ntail")))
    assert(got(1L) == ((3L, 1L, "one body")))
    assert(got(2L) == ((3L, 2L, "\ntwo body")))
  }

  test("crawl delta: new/deleted/changed/unchanged from md5 full-outer") {
    val a = Seq(("u1", "same"), ("u2", "old text"), ("u3", "gone"))
      .toDF("url", "text")
    val b = Seq(("u1", "same"), ("u2", "new text"), ("u4", "fresh"))
      .toDF("url", "text")
    val got = Curation.crawlDelta(a, b).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("u1" -> "unchanged", "u2" -> "changed",
      "u3" -> "deleted", "u4" -> "new"))
    // hash columns: null exactly on the missing side
    val rows = Curation.crawlDelta(a, b).collect()
      .map(r => r.getString(0) -> (r.isNullAt(2), r.isNullAt(3))).toMap
    assert(rows("u3") == ((false, true)) && rows("u4") == ((true, false)))
  }

  test("mainContent: link-dense and short blocks drop, article survives") {
    val pages = Seq(
      ("u1",
        "<html><body>" +
          "<div>nav <a href=\"/\">Home page</a> <a href=\"/a\">All the posts</a></div>" +
          "<p>this is a long article paragraph about real things</p>" +
          "<p>tiny</p>" +
          "<h2>a mid-length heading with words</h2>" +
          "<footer>contact us at <a href=\"/c\">the contact form here</a></footer>" +
          "</body></html>"),
      // page that is ALL boilerplate -> empty main_text, zero kept
      ("u2", "<div><a href=\"/x\">only a link lives here</a></div>")
    ).toDF("url", "html")
    val got = Curation.mainContent(pages).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // u1 blocks: preamble(empty) / nav / article / tiny / h2 / footer
    assert(got("u1")._1 == 6L)
    assert(got("u1")._2 == 2L)
    assert(got("u1")._3 ==
      "this is a long article paragraph about real things\n" +
        "a mid-length heading with words")
    assert(got("u2") == ((2L, 0L, "")))
  }

  test("host boilerplate: per-host threshold, repeats within a page vote once") {
    val pages = Seq(
      // host a: nav on 3/3 pages, promo on 2/3 (>=0.5), rare on 1/3
      ("https://a.com/1", "nav-a\npromo\nrare\nbody 1"),
      ("https://a.com/2", "nav-a\npromo\nbody 2"),
      // repeated nav within ONE page still counts one page
      ("https://a.com/3", "nav-a\nnav-a\nbody 3"),
      // host b: same 'promo' line but only 1/2 pages -> NOT boilerplate
      // for b (scoping is per host, not global)
      ("https://b.com/1", "nav-b\npromo\nbody 4"),
      ("https://b.com/2", "nav-b\nbody 5"),
      // host c: single page -> below minPages, nothing mined
      ("https://c.com/1", "nav-c\nnav-c\nbody 6")
    ).toDF("url", "text")
    val got = Curation.hostBoilerplate(pages)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      ("a.com", "nav-a", 3L, 3L), ("a.com", "promo", 2L, 3L),
      ("b.com", "nav-b", 2L, 2L)))
    val cleaned = Curation.stripBoilerplate(pages,
        Curation.hostBoilerplate(pages))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // host a loses nav+promo; host b loses nav only; host c keeps all
    assert(cleaned("https://a.com/1") == ((4L, 2L, "rare\nbody 1")))
    assert(cleaned("https://a.com/3") == ((3L, 1L, "body 3")))
    assert(cleaned("https://b.com/1") == ((3L, 2L, "promo\nbody 4")))
    assert(cleaned("https://c.com/1") == ((3L, 3L, "nav-c\nnav-c\nbody 6")))
  }
}
