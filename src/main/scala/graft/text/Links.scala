package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hyperlink extraction over raw page html — the web-graph side of a
 * Common-Crawl-style KG pipeline (the input table's `html:binary` column
 * carries the links the `text` column has already stripped).
 *
 * Two operators:
 *  - `extractLinks`: html → one row per `<a href>` tag, destination
 *    resolved against the source url and canonicalized with
 *    `Curation.canonicalUrl`. This is the edge list every downstream
 *    graph signal in `link/GraphOps` (PageRank q49, triangles q48,
 *    k-core q58) consumes at crawl scale.
 *  - `anchorStats`: the classic anchor-text aggregation — top-k anchor
 *    strings per destination. Anchor text is the web's free alias
 *    dictionary: pages linking "Robert Smith" and "Bob Smith" at the same
 *    target are alias evidence the entity linker (`link/Linker`) can merge
 *    with its gazetteer pairs.
 *
 * Scale shape: extraction is pure per-row column expressions
 * (regexp_extract_all + posexplode) that fuse into the scan task — no
 * shuffle, no UDF, and the regexes stay in the Java∩RE2 subset so a DuckDB
 * oracle states the same semantics independently. `anchorStats` is one
 * map-side-combinable (dst, anchor) count shuffle; its per-dst rank window
 * runs over the anchor-DISTINCT table, so a hot target linked a billion
 * times with one anchor costs one combined row, never a per-key sort of
 * raw edges.
 *
 * Honest scope: the tag scan handles flat anchors (`<a ...>text</a>` with
 * no nested markup in the anchor) and resolves absolute, root-relative and
 * directory-relative hrefs; `<base href>`, `../` normalization and nested
 * anchor markup need a real html parser and are out of scope — documented,
 * not guessed at.
 */
object Links {

  /** Flat `<a ...>anchor</a>` tags; [^<]* keeps anchor markup-free. */
  private val TagRe = "(?i)<a\\s[^>]*>[^<]*</a>"
  private val HrefRe = "(?i)href=\"([^\"]*)\""
  private val AnchorRe = ">([^<]*)<"
  // any scheme prefix (mailto:, javascript:, https://...) — such hrefs are
  // already absolute and must never be joined to the source directory;
  // non-http(s) ones then fail the https?:// keep-filter and drop out.
  private val SchemeRe = "^[A-Za-z][A-Za-z0-9+.-]*:"

  /**
   * One row per extracted hyperlink:
   * (src_url, pos, href, dst_url, anchor) where `href` is the raw
   * attribute value, `dst_url` the resolved + canonicalized destination,
   * `pos` the 0-based tag position within the page. Non-http(s)
   * destinations (mailto:, javascript:, tel:) and empty hrefs are
   * dropped. `htmlCol` may be BINARY (utf-8) or STRING.
   */
  def extractLinks(pages: DataFrame, urlCol: String = "url",
                   htmlCol: String = "html"): DataFrame = {
    val htmlStr =
      if (pages.schema(htmlCol).dataType ==
          org.apache.spark.sql.types.BinaryType)
        decode(col(htmlCol), "UTF-8")
      else col(htmlCol).cast("string")
    val src = col(urlCol)
    // scheme://host[:port] of the source page, and its directory path
    val schemeHost = regexp_extract(src, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    val srcPath = regexp_extract(src, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val srcDir = regexp_replace(srcPath, "[^/]*$", "")
    val tagged = pages
      .select(src.as("_src"), schemeHost.as("_sh"),
        when(srcDir === "", lit("/")).otherwise(srcDir).as("_dir"),
        regexp_extract_all(htmlStr, lit(TagRe), lit(0)).as("_tags"))
      .select(col("_src"), col("_sh"), col("_dir"),
        posexplode(col("_tags")).as(Seq("pos", "_tag")))
    val href = regexp_extract(col("_tag"), HrefRe, 1)
    val resolved =
      when(href.rlike(SchemeRe), href)
        .when(href.startsWith("/"), concat(col("_sh"), href))
        .otherwise(concat(col("_sh"), col("_dir"), href))
    tagged
      .select(
        Curation.canonicalUrl(col("_src")).as("src_url"),
        col("pos"),
        href.as("href"),
        resolved.as("_resolved"),
        trim(regexp_extract(col("_tag"), AnchorRe, 1)).as("anchor"))
      .filter(col("href") =!= "" && col("_resolved").rlike("^(?i)https?://"))
      .select(col("src_url"), col("pos"), col("href"),
        Curation.canonicalUrl(col("_resolved")).as("dst_url"), col("anchor"))
  }

  /**
   * Top-k anchor strings per destination url by (count DESC, anchor ASC),
   * with in-degree context: (dst_url, anchor, n, rank, n_srcs) where
   * `n_srcs` sums the per-(dst, anchor) DISTINCT-src counts — an upper
   * bound on the destination's distinct in-degree that over-counts any
   * src linking the same dst under two different anchors (exact per
   * anchor, approximate per dst; use `hostGraph`'s n_src_pages for exact
   * in-degree). Empty anchors are excluded. The rank-1 anchor is the
   * destination's canonical surface form; lower ranks are its mined
   * aliases.
   */
  def anchorStats(links: DataFrame, k: Int = 5): DataFrame = {
    val counted = links
      .filter(col("anchor") =!= "")
      .groupBy(col("dst_url"), col("anchor"))
      .agg(count(lit(1)).as("n"),
        // distinct srcs per (dst, anchor); summed per dst below it
        // over-counts a src using two DIFFERENT anchors — acceptable for
        // the in-degree context signal, exact per-anchor.
        countDistinct(col("src_url")).as("_srcs"))
    val w = Window.partitionBy(col("dst_url"))
    counted
      .withColumn("rank", row_number().over(
        w.orderBy(col("n").desc, col("anchor").asc)))
      .withColumn("n_srcs", sum(col("_srcs")).over(w))
      .filter(col("rank") <= k)
      .select(col("dst_url"), col("anchor"), col("n"), col("rank"),
        col("n_srcs"))
  }

  /**
   * Host-level rollup of the page link graph (the "host graph" every
   * web-graph study aggregates to before ranking or partitioning a crawl):
   * one row per (src_host, dst_host) with total link count, DISTINCT
   * linking pages, and an `is_internal` same-host flag. At 10^12 edges the
   * page graph is too fine for frontier scheduling or domain authority —
   * the host graph (|hosts|² worst case, ~|hosts| observed) is the table
   * those decisions read.
   *
   * Scale shape: host extraction is a pure regex on the already-canonical
   * urls (lowercased, www/port-stripped by `Curation.canonicalUrl`), so it
   * fuses into the edge scan; the rollup is ONE keyed aggregate whose
   * count is map-side combinable (the distinct-pages count keeps Spark's
   * two-phase distinct-aggregate rewrite, still keyed by the group —
   * never a per-host set in one task).
   */
  def hostGraph(links: DataFrame): DataFrame = {
    val host = (c: Column) =>
      regexp_extract(c, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)
    links
      .select(host(col("src_url")).as("src_host"),
        host(col("dst_url")).as("dst_host"), col("src_url"))
      .groupBy(col("src_host"), col("dst_host"))
      .agg(count(lit(1)).as("n_links"),
        countDistinct(col("src_url")).as("n_pages"))
      .withColumn("is_internal", col("src_host") === col("dst_host"))
  }

  /**
   * Crawl frontier: destinations not yet crawled, ranked for fetch
   * priority — the scheduling table a crawler reads between snapshots.
   * Anti-join against the crawled url set, in-degree rollup (distinct
   * referring pages `n_refs` + raw link count `n_links`), global top-k by
   * the deterministic total order (n_refs DESC, dst_url ASC).
   *
   * Scale shape: the anti-join and the rollup are both keyed by url
   * (map-side-combinable count; distinct-refs via the two-phase rewrite);
   * the top-k executes as TakeOrdered per-partition heaps — never a
   * global sort of the frontier.
   */
  def frontier(links: DataFrame, crawled: DataFrame, k: Int): DataFrame =
    links.join(crawled.select(col("url").as("_c")),
        col("dst_url") === col("_c"), "left_anti")
      .groupBy(col("dst_url"))
      .agg(countDistinct(col("src_url")).as("n_refs"),
        count(lit(1)).as("n_links"))
      .orderBy(col("n_refs").desc, col("dst_url").asc)
      .limit(k)

  /**
   * Mined alias pairs for the entity linker: for each destination with a
   * clear canonical anchor (rank 1) and at least `minCount` support on the
   * alias side, emit (alias, canonical). The pair feeds
   * `Linker.canonicalize`'s alias dictionary exactly like a gazetteer row.
   */
  def aliasPairs(links: DataFrame, k: Int = 5, minCount: Long = 2): DataFrame = {
    val stats = anchorStats(links, k)
    val canon = stats.filter(col("rank") === 1)
      .select(col("dst_url"), col("anchor").as("canonical"))
    stats.filter(col("rank") > 1 && col("n") >= minCount)
      .select(col("dst_url"), col("anchor").as("alias"), col("n"))
      .join(canon, "dst_url")
      .select(col("alias"), col("canonical"), col("n"))
  }

  /**
   * URL-template mining: collapse every digit run in the path+query to
   * `{N}` and group — `/p123?x=9` and `/p7?x=1` share `/p{N}?x={N}`, so a
   * crawl's product/article/pagination families surface as a handful of
   * (host, template) rows with counts. The standard input to crawl-budget
   * and dedup policy ("this host is 95% one template"). One map-side
   * combinable aggregate over a regexp projection; `example` is the min
   * url so the row is stable under any partitioning.
   */
  def urlTemplates(urls: DataFrame, urlCol: String = "url"): DataFrame =
    urls
      .select(
        regexp_extract(col(urlCol),
          "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1).as("host"),
        regexp_replace(
          regexp_extract(col(urlCol),
            "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$", 1),
          "[0-9]+", "{N}").as("template"),
        col(urlCol).as("_u"))
      .groupBy(col("host"), col("template"))
      .agg(count(lit(1)).as("n_urls"), min(col("_u")).as("example"))

  /**
   * Blocklist/allowlist URL filtering with longest-prefix-wins semantics
   * (the robots.txt Allow/Disallow resolution rule, RFC 9309 §2.2.2):
   * `rules` is a small (host, path_prefix, allow) table; a url matches a
   * rule when hosts are equal and its path starts with the prefix; among
   * matches the LONGEST prefix decides (tie → the disallow wins, the
   * spec's conservative reading); no match → allowed. Returns the urls
   * with (matched_prefix, allowed) so callers can both filter and audit.
   *
   * Scale shape: the rule table is policy-sized (thousands of rows, not
   * corpus-sized) — Spark broadcasts it; the per-url work is one
   * broadcast join on host plus a startsWith filter, and the winner is an
   * ordering-encoded max_by aggregate keyed by url (no window, no sort).
   */
  def applyUrlRules(urls: DataFrame, rules: DataFrame,
                    urlCol: String = "url"): DataFrame = {
    val path = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$", 1)
    val withHost = urls.select(col(urlCol).as("url"),
      regexp_extract(col(urlCol),
        "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1).as("host"),
      path.as("_path"))
    val r = rules.select(col("host"), col("path_prefix"), col("allow"))
    withHost
      .join(broadcast(r), Seq("host"), "left")
      .withColumn("_m",
        col("path_prefix").isNotNull &&
          col("_path").startsWith(col("path_prefix")))
      .groupBy(col("url"))
      // winner = max by (prefix length, disallow-first): encode allow as
      // 0/1 so a tied-length disallow (0) loses the max to nothing —
      // i.e. (len, 0) < (len, 1) would make ALLOW win; invert so the
      // disallow wins ties: encode allow=false as the larger key part
      .agg(max(when(col("_m"),
          struct(length(col("path_prefix")).as("l"),
            when(col("allow"), 0).otherwise(1).as("d"),
            col("path_prefix").as("p"),
            col("allow").as("a"))))
        .as("_w"))
      .select(col("url"), col("_w.p").as("matched_prefix"),
        coalesce(col("_w.a"), lit(true)).as("allowed"))
  }

  /**
   * Per-host crawl-budget apportionment: split a fetch budget of `budget`
   * slots across hosts proportionally to their frontier demand using
   * largest-remainder (Hamilton) apportionment — exact integer
   * arithmetic, so the allocation is bit-deterministic and sums to
   * exactly `budget` (or to total demand when demand < budget; a host is
   * never allocated more than it asked for... demand caps the share
   * upstream because shares are ⌊budget·demand/total⌋ ≤ demand whenever
   * budget ≤ total, and the else-branch allocates demand directly).
   *
   * Scale shape: demand is one count per HOST (crawl-frontier rollup —
   * policy-sized, not url-sized); the total is a one-row broadcast; the
   * remainder ranking is a window over the host table, documented
   * host-cardinality-bounded like the T7 sweep.
   */
  def crawlBudget(demand: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = demand.agg(sum(col("demand")).as("_total"))
    // `div`, not `/`: Column./ on longs is IEEE double division, which
    // silently loses exactness past 2^53 — `div` stays in long arithmetic
    val base = demand.crossJoin(broadcast(tot))
      .withColumn("_num", lit(budget) * col("demand"))
      .withColumn("_floor",
        when(lit(budget) >= col("_total"), col("demand"))
          .otherwise(expr("_num div _total")))
      .withColumn("_rem",
        when(lit(budget) >= col("_total"), lit(0L))
          .otherwise(col("_num") % col("_total")))
    val w = Window.orderBy(col("_rem").desc, col("host").asc)
    val wAll = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    base
      .withColumn("_rank", row_number().over(w))
      .withColumn("_leftover",
        least(lit(budget), col("_total")) - sum(col("_floor")).over(wAll))
      .select(col("host"), col("demand"),
        (col("_floor") +
          when(col("_rank") <= col("_leftover"), 1L).otherwise(0L))
          .as("allocated"))
  }
}
