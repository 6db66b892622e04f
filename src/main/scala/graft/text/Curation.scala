package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for training-data prep: deterministic
 * stratified sampling and token-budget shard packing. Both are exact and
 * engine-reproducible (md5 ranks, integer arithmetic — no RNG state), so
 * a DuckDB oracle recomputes them row for row.
 *
 * Both are written for the 100-TB shape, not just correctness:
 * stratified sampling never sorts a whole stratum in one task (salted
 * two-phase top-k), and packing never runs a global unpartitioned window
 * (per-block prefix sums + a tiny broadcast offset table).
 */
object Curation {

  /** Deterministic "reservoir": keep the k smallest md5(doc_id) per
   *  stratum. md5 over the id is a fixed uniform permutation, so this is
   *  an unbiased sample any engine reproduces bit-for-bit.
   *
   *  Scale shape: a giant stratum (half the crawl is English) would make
   *  a single `row_number() OVER (PARTITION BY stratum)` sort billions of
   *  rows in ONE task. Instead: stage 1 takes the per-(stratum, salt)
   *  top-k over `salts` hash-split subgroups (each subgroup sorts only
   *  its own slice), shrinking a stratum to ≤ salts·k rows; stage 2 takes
   *  the exact top-k over that bounded remainder. Any row in the true
   *  top-k is also in its salt-group's top-k, so the two-phase result is
   *  exact. */
  def stratifiedSample(docs: DataFrame, stratumCol: String, k: Int,
                       salts: Int = 64): DataFrame = {
    val r = md5(col("doc_id").cast("string"))
    val salt = pmod(xxhash64(col("doc_id")), lit(salts))
    val stage1 = docs
      .withColumn("_r", r).withColumn("_s", salt)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(stratumCol), col("_s"))
          .orderBy(col("_r"), col("doc_id"))))
      .filter(col("_rn") <= k).drop("_rn", "_s")
    stage1
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(stratumCol))
          .orderBy(col("_r"), col("doc_id"))))
      .filter(col("_rn") <= k).drop("_rn", "_r")
  }

  /** Benchmark-contamination tagging (the GPT-3 appendix-C /
   *  open-data decontamination shape): mark every training doc with how
   *  many of its distinct word n-gram shingles also occur in an
   *  evaluation-benchmark corpus, so contaminated docs can be dropped or
   *  audited before training. Returns every input doc:
   *  (doc_id, n_shingles, n_hit, contaminated_frac, contaminated).
   *
   *  Scale shape: the benchmark side is eval suites — MBs against a
   *  100-TB crawl — so its distinct shingle set is BROADCAST (as the
   *  build side of a left-outer BroadcastHashJoin: hit shingles get a
   *  flag, misses get null) and the crawl side is read ONCE and never
   *  shuffled for the probe; n_shingles and n_hit come out of the same
   *  groupBy, so the corpus sees exactly two exchanges total — the
   *  per-doc distinct (partial-agg on (doc_id, shingle)) and the per-doc
   *  count on doc_id. n=3-word shingles by default (decontamination uses
   *  8-13; the synthetic docs are ~30 tokens, so 3 keeps the fixture's
   *  hit rate meaningful). */
  def contamination(docs: DataFrame, benchmark: DataFrame,
                    n: Int = 3): DataFrame = {
    def shingles(d: DataFrame): DataFrame = {
      val ws = split(col("text"), " ")
      val grams = when(size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n), j =>
          concat_ws(" ", (0 until n).map(i => element_at(ws, j + i + 1)): _*)))
        .otherwise(array().cast("array<string>"))
      d.select(col("doc_id"), explode(grams).as("sh"))
    }
    val benchSet = shingles(benchmark).select("sh").distinct()
    // one pass over the corpus shingles: the broadcast left join tags the
    // hits, then a single per-doc aggregate counts both totals and hits
    // (count(col) skips nulls) — never materializing the shingle table twice
    val perDoc = shingles(docs).distinct()
      .join(broadcast(benchSet.withColumn("_hit", lit(1))), Seq("sh"), "left")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_shingles"),
        count(col("_hit")).as("n_hit"))
    docs.select("doc_id")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("contaminated_frac",
        when(col("n_shingles") > 0,
          col("n_hit").cast("double") / col("n_shingles")))
      .withColumn("contaminated", col("n_hit") > 0)
  }

  /** Canonicalize a URL column for recrawl/mirror dedup (the CCNet /
   *  Common-Crawl-index normalization shape): lowercase scheme and host,
   *  strip a leading `www.`, strip the scheme's default port (:80 http,
   *  :443 https), drop the fragment, drop tracking query params
   *  (`utm_*`, `fbclid`, `gclid`) while preserving the rest in order,
   *  collapse trailing slashes (empty path → "/"). Non-URL strings pass
   *  through trimmed, never nulled. Pure column expressions (regex kept
   *  RE2-compatible — no lookbehind — so a DuckDB oracle can state the
   *  same semantics independently), codegen-friendly, no UDF. */
  def canonicalUrl(u: Column): Column = {
    val t = regexp_replace(trim(u), "#.*", "") // fragment never survives
    val scheme = lower(regexp_extract(t, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth =
      lower(regexp_extract(t, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val host0 = regexp_replace(auth, "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest = regexp_extract(t, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$", 1)
    val path0 = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query0 = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val params = filter(split(query0, "&"), p =>
      !(p.rlike("^(utm_[^=]*|fbclid|gclid)=") || p === lit("")))
    val query = array_join(params, "&")
    when(scheme === "", trim(u)).otherwise(concat(scheme, lit("://"), host,
      path, when(query === "", lit("")).otherwise(concat(lit("?"), query))))
  }

  /** Batch recrawl dedup: keep the newest capture of each canonical URL
   *  (the batch twin of the streaming watermarked
   *  `dropDuplicatesWithinWatermark` recrawl dedup). Returns one row per
   *  canonical URL — the winning row's columns plus `canonical_url` and
   *  `n_crawls`.
   *
   *  Scale shape: ONE shuffle, keyed on the canonical URL, and the
   *  winner is a streaming `max(struct(ts, ...))` aggregate with map-side
   *  partial combine — a hot URL recrawled millions of times costs one
   *  running maximum per task, never a per-key sort (no window). The
   *  struct compares `tsCol` first, then the remaining columns in input
   *  order as a deterministic tie-break. */
  def latestCrawl(pages: DataFrame, urlCol: String = "url",
                  tsCol: String = "warc_ts"): DataFrame = {
    val others = pages.columns.filterNot(_ == tsCol)
    val packed = struct((col(tsCol) +: others.map(col)): _*)
    pages
      .groupBy(canonicalUrl(col(urlCol)).as("canonical_url"))
      .agg(max(packed).as("_top"), count(lit(1)).as("n_crawls"))
      .select(col("canonical_url") +:
        pages.columns.map(c => col(s"_top.`$c`").as(c)) :+
        col("n_crawls"): _*)
  }

  /** Pack docs (in doc_id order) into training shards of ~`budget` tokens:
   *  shard = floor(exclusive-prefix-sum(tokens) / budget). A doc that
   *  straddles a boundary belongs to the shard its first token falls in —
   *  the greedy rule sequence-packing pipelines use.
   *
   *  Scale shape: the naive `sum() OVER (ORDER BY doc_id)` with no
   *  PARTITION BY is a single-task scan of the corpus. Instead the
   *  prefix sum is distributed: block = doc_id / blockSize; per-block
   *  running sums partition by block (bounded tasks), block TOTALS form a
   *  tiny table whose cumulative offsets are the only unpartitioned
   *  window, then offset + within-block prefix is joined back. The shard
   *  assignment is the exact global prefix sum regardless of the block
   *  decomposition, so blockSize is purely a plan knob: by default
   *  (`blockSize = 0` = auto) it is derived from the corpus id range to
   *  keep the offset table ≤ [[TargetPackBlocks]] rows (~10^6 at 10^12
   *  docs — the offset window AND the join build side stay bounded no
   *  matter the corpus size; a fixed blockSize=1000 at 10^12 docs would
   *  have made offsets a 10^9-row "tiny" table). The broadcast hint on
   *  the join-back is applied only on the auto path, where the offset
   *  table is provably ≤ TargetPackBlocks rows; with a caller-chosen
   *  blockSize its size is unknown, so AQE picks the join strategy from
   *  runtime stats. Returns (doc_id, n_tokens, shard). */
  def packShards(spark: SparkSession, docs: DataFrame, budget: Long,
                 blockSize: Long = 0L): DataFrame = {
    import spark.implicits._
    val blk =
      if (blockSize > 0L) blockSize
      else {
        // one column-pruned max() over the id column sizes the blocks;
        // ids are assumed ~dense from 0 (this operator's doc_id-order
        // contract), so (maxId+1)/TargetPackBlocks caps the block count
        val maxId = docs.agg(max($"doc_id").cast("long")).as[Option[Long]]
          .head().getOrElse(0L)
        math.max(1000L, (maxId + 1 + TargetPackBlocks - 1) / TargetPackBlocks)
      }
    val toks = docs.select($"doc_id",
      regexp_count($"text", lit("\\S+")).cast("long").as("n_tokens"),
      ($"doc_id" / blk).cast("long").as("_blk"))
    val inBlk = toks.withColumn("_pre",
      sum($"n_tokens").over(Window.partitionBy($"_blk").orderBy($"doc_id"))
        - $"n_tokens")
    val offsets = toks.groupBy($"_blk")
      .agg(sum($"n_tokens").as("_tot"))
      .withColumn("_off",
        coalesce(sum($"_tot").over(
          Window.orderBy($"_blk").rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
      .select($"_blk", $"_off")
    // auto-sized blocks are ≤ TargetPackBlocks by construction → the
    // hint is safe; with a caller-chosen blockSize the block count is
    // unknown without a job, so leave the strategy to AQE's size stats
    val offSide = if (blockSize <= 0L) broadcast(offsets) else offsets
    inBlk.join(offSide, Seq("_blk"))
      .select($"doc_id", $"n_tokens",
        (($"_pre" + $"_off") / budget).cast("long").as("shard"))
      .orderBy($"doc_id")
  }

  /** Auto-sizing target for [[packShards]]' block-offset table: blocks
   *  ≈ min(idRange, 10^6) keeps the only unpartitioned window AND the
   *  broadcast join-back side ≤ ~16 MB (16 B/row) at ANY corpus size;
   *  at 10^12 docs each block then spans 10^6 ids — a bounded per-task
   *  window sort. */
  val TargetPackBlocks = 1000000L

  // --- PII detection / redaction -------------------------------------
  // Patterns stay in the Java-regex ∩ RE2 common subset (char classes,
  // bounded repetition, \b, alternation — no lookaround, no backrefs) so
  // a DuckDB oracle states byte-identical semantics independently.
  /** email: local@domain.tld (pragmatic training-data shape, not RFC5322) */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** NANP-style phone: optional +, 3-3-4 digit groups with -, . or space */
  val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
  /** dotted-quad IPv4 (word-bounded; no octet range check — a redactor
   *  over-matching 999.0.0.1 is the safe direction) */
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII signals + redaction for training-data prep: per doc, count
   *  non-overlapping email / phone / IPv4 matches in the ORIGINAL text,
   *  and produce a redacted text with each match replaced by a typed
   *  placeholder. Replacement is sequential — email, then phone, then
   *  IPv4 — so the output is well-defined when patterns could abut
   *  (counts are always over the original text, never the partly
   *  redacted one).
   *
   *  Scale shape: pure codegen'd column expressions — no UDF, no
   *  shuffle, no state; the pass fuses into whatever scan feeds it. */
  def piiSignals(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val red = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(PhoneRe)).cast("long").as("n_phones"),
      regexp_count(t, lit(Ipv4Re)).cast("long").as("n_ipv4"),
      red.as("redacted_text"))
      .withColumn("n_pii", col("n_emails") + col("n_phones") + col("n_ipv4"))
      .withColumn("has_pii", col("n_pii") > 0)
  }

  /** Per-registered-domain corpus rollup + blocklist flag (the UT1 /
   *  domain-filtering shape every crawl-curation pipeline runs before
   *  anything touches page text): host extracted from the URL authority
   *  (lowercased, `www.` and any port stripped), registered domain
   *  approximated as the last two dot-labels (a production pass swaps in
   *  the public-suffix list as a data file — same plan shape). Returns
   *  one row per domain: (domain, n_pages, n_hosts, total_tokens,
   *  blocked).
   *
   *  Scale shape: two keyed aggregations — (domain, host) then domain —
   *  both with map-side partial combine, so the exact host-distinct
   *  never builds a per-domain set; the blocklist is a literal `isin`
   *  (list form; a table-sized blocklist joins broadcast instead, same
   *  plan shape otherwise). A 10^8-page domain costs one running count
   *  per task, never a per-key sort. */
  def domainStats(pages: DataFrame, blocklist: Seq[String],
                  urlCol: String = "url", textCol: String = "text"): DataFrame = {
    val auth = lower(regexp_extract(trim(col(urlCol)),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val host = regexp_replace(regexp_replace(auth, ":[0-9]+$", ""),
      "^www\\.", "")
    val dom = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    pages
      .select(dom.as("domain"), host.as("host"),
        regexp_count(col(textCol), lit("\\S+")).cast("long").as("_toks"))
      .groupBy("domain", "host")
      .agg(count(lit(1)).as("_n"), sum("_toks").as("_t"))
      .groupBy("domain")
      .agg(sum("_n").as("n_pages"), count(lit(1)).as("n_hosts"),
        sum("_t").as("total_tokens"))
      .withColumn("blocked",
        if (blocklist.isEmpty) lit(false) else col("domain").isin(blocklist: _*))
  }

  /** CCNet-style line-level boilerplate removal: a line that occurs in
   *  ≥ `minDocs` DISTINCT documents is boilerplate (nav bars, cookie
   *  banners, copyright footers — the dominant noise in extracted web
   *  text) and is dropped from every document; the rest of each doc is
   *  reassembled in original line order. Returns every input doc:
   *  (doc_id, n_lines, n_kept, cleaned_text) — n_kept = 0 and
   *  cleaned_text = "" for an all-boilerplate doc.
   *
   *  Scale shape: the frequent-line table is keyed and joined on
   *  md5(line) so the shuffle carries a fixed-width hash, not page-long
   *  strings, and is ≤ corpus/minDocs rows by construction — AQE picks a
   *  broadcast join when it fits (boilerplate is heavy-tailed, it
   *  usually does). Three keyed shuffles total: distinct (hash, doc),
   *  the hash count, and the per-doc reassembly, whose collect_list is
   *  bounded by a single document's own line count. */
  /**
   * Crawl-snapshot delta: per-url status between two crawl snapshots —
   * `new` (only in the new snapshot), `deleted` (only in the old),
   * `changed` / `unchanged` (md5 of the text differs / agrees). This is
   * the incremental-recrawl primitive: at 10^10 urls per snapshot a full
   * reprocess is wasted compute — downstream stages (NLP, dedup, KG
   * extraction) re-run only on `new` + `changed` rows.
   *
   * Contract: one row per url per snapshot (feed `latestCrawl` output if
   * captures repeat — a duplicate url would cross-product in the join).
   * Scale shape: the md5 is computed map-side so the single full-outer
   * sort-merge shuffle carries (url, 32-hex) rows, never page text.
   */
  def crawlDelta(oldSnap: DataFrame, newSnap: DataFrame,
                 urlCol: String = "url", textCol: String = "text")
      : DataFrame = {
    val a = oldSnap.select(col(urlCol).as("url"), md5(col(textCol)).as("old_md5"))
    val b = newSnap.select(col(urlCol).as("url"), md5(col(textCol)).as("new_md5"))
    a.join(b, Seq("url"), "full_outer")
      .select(col("url"),
        when(col("old_md5").isNull, lit("new"))
          .when(col("new_md5").isNull, lit("deleted"))
          .when(col("old_md5") === col("new_md5"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_md5"), col("new_md5"))
  }

  /**
   * C4-style global span dedup (Raffel et al. 2020 §2.2 dedup a repeated
   * span everywhere EXCEPT its first occurrence; unit here = line, the
   * same split `lineDedup` uses): a non-blank line's first occurrence in
   * corpus order (min (doc_id, pos)) is kept, every later occurrence is
   * dropped; blank lines always survive (they are layout, not content).
   * Complements `lineDedup` (CCNet df-threshold: frequent lines drop
   * EVERYWHERE) — C4 semantics preserve exactly one copy.
   *
   * Scale shape: the first-occurrence table is one map-side-combinable
   * `min(struct(doc_id, pos))` per distinct line hash; the join back is
   * keyed on md5 so the shuffle carries fixed-width hashes, never line
   * text twice; reassembly is the per-doc collect bounded by the doc's
   * own line count.
   */
  def spanDedup(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val keyed = lines.withColumn("_h",
      when(length(trim(col("line"))) > 0, md5(col("line"))))
    val first = keyed.filter(col("_h").isNotNull)
      .groupBy(col("_h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("_w"))
    keyed.join(first, Seq("_h"), "left")
      .withColumn("_keep", col("_h").isNull ||
        (col("doc_id") === col("_w.doc_id") && col("pos") === col("_w.pos")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("_keep"), 1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("_keep"), struct(col("pos"), col("line"))))),
          s => s("line")), "\n").as("cleaned_text"))
  }

  /**
   * Per-HOST boilerplate-line mining (CCNet-style template removal, scoped
   * the way real web templates are scoped): a non-blank line is
   * boilerplate for host H when it appears on ≥ `minFrac` of H's pages
   * AND on ≥ `minCount` pages absolutely (and H has ≥ `minPages` pages —
   * a 1-page host can't vote; without the absolute floor a 2-page host
   * would flag EVERY line one of its pages carries). This is the
   * complement of [[lineDedup]] (global df threshold — catches
   * cross-site phrases) and [[spanDedup]] (C4 first-occurrence): nav bars,
   * cookie banners and footers repeat WITHIN a host and would need a huge
   * global threshold to catch without also eating common sentences.
   *
   * Output: (host, line, n_pages, host_pages, frac) — the mined template
   * table, one row per boilerplate line. Feed it to [[stripBoilerplate]]
   * to clean the pages.
   *
   * Scale shape: lines are deduped per (host, url, line-md5) — a repeated
   * line within one page votes once — then counted with a map-side
   * combinable aggregate keyed (host, md5); host page totals are a second
   * small keyed count joined on host. Line text rides the count shuffle
   * only as the min(line) partial — one surface per (host, hash) per map
   * partition after combine (md5 collision ⇒ one deterministic surface
   * wins, never a dropped host). Skew = pages per host, the natural
   * web-crawl partition key.
   */
  def hostBoilerplate(pages: DataFrame, minFrac: Double = 0.5,
                      minPages: Int = 2, minCount: Int = 2,
                      urlCol: String = "url",
                      textCol: String = "text"): DataFrame = {
    val host = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)
    val lines = pages
      .select(host.as("host"), col(urlCol).as("_url"),
        explode(split(col(textCol), "\n")).as("line"))
      .filter(length(trim(col("line"))) > 0)
      .select(col("host"), col("_url"), md5(col("line")).as("_h"),
        col("line"))
      .distinct()
    val hostPages = pages.select(host.as("host"), col(urlCol).as("_url"))
      .distinct()
      .groupBy("host").agg(count(lit(1)).as("host_pages"))
    lines.groupBy(col("host"), col("_h"))
      .agg(min(col("line")).as("line"), count(lit(1)).as("n_pages"))
      .join(hostPages, Seq("host"))
      .filter(col("host_pages") >= minPages && col("n_pages") >= minCount &&
        col("n_pages") >= col("host_pages") * minFrac)
      .select(col("host"), col("line"), col("n_pages"), col("host_pages"),
        round(col("n_pages").cast("double") / col("host_pages"), 12)
          .as("frac"))
  }

  /**
   * Remove a mined boilerplate table ([[hostBoilerplate]]) from pages:
   * per page, drop the lines whose (host, md5) is in the table, keep
   * order, report counts. The template table is tiny relative to the
   * corpus (distinct boilerplate lines per host) — Spark broadcasts it;
   * the page side stays a narrow explode/reassemble keyed by url.
   */
  def stripBoilerplate(pages: DataFrame, boiler: DataFrame,
                       urlCol: String = "url",
                       textCol: String = "text"): DataFrame = {
    val host = regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1)
    val b = boiler.select(col("host"), md5(col("line")).as("_h"),
      lit(true).as("_boiler"))
    pages
      .select(host.as("host"), col(urlCol).as("url"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("_h", md5(col("line")))
      .join(b, Seq("host", "_h"), "left")
      .groupBy(col("url"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("_boiler").isNull, 1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("_boiler").isNull, struct(col("pos"), col("line"))))),
          s => s("line")), "\n").as("cleaned_text"))
  }

  /**
   * Main-content extraction (boilerpipe-style link-density heuristic,
   * Kohlschütter et al. WSDM 2010 §3 reduced to its two strongest
   * features): split html into blocks at block-level open tags, strip
   * tags, and keep blocks that are long enough (≥ `minLen` chars) and
   * link-poor enough (anchor-text chars · 100 ≤ text chars ·
   * `maxDensityPct` — integer arithmetic, no float threshold). Nav bars,
   * footers and promo blocks are short and link-dense; article bodies are
   * the opposite. Output: (url, n_blocks, n_kept, main_text) with kept
   * blocks joined in document order.
   *
   * Implementation notes for the oracle twin: the block split inserts a
   * `\\u0001` sentinel BEFORE each block tag and splits on it (RE2 has no
   * lookahead, and DuckDB is RE2 — a lookahead split would be
   * inexpressible there); all regexes stay in the RE2 ∩ java.util.regex
   * common subset. Per-url work is linear in page size; the only shuffle
   * is the per-url reassembly groupBy.
   */
  def mainContent(pages: DataFrame, minLen: Int = 20,
                  maxDensityPct: Int = 30, urlCol: String = "url",
                  htmlCol: String = "html"): DataFrame = {
    val marked = regexp_replace(col(htmlCol),
      "(?i)<(p|div|nav|footer|h[1-6])\\b", "\u0001<$1")
    val blocks = pages
      .select(col(urlCol).as("url"),
        posexplode(split(marked, "\u0001")).as(Seq("pos", "block")))
      .withColumn("txt",
        trim(regexp_replace(col("block"), "<[^>]*>", " ")))
      .withColumn("alen",
        aggregate(
          transform(
            regexp_extract_all(col("block"),
              lit("(?i)<a[^>]*>([^<]*)</a>"), lit(1)),
            a => length(a)),
          lit(0), (acc, x) => acc + x))
      .withColumn("keep",
        length(col("txt")) >= minLen &&
          col("alen") * 100 <= length(col("txt")) * maxDensityPct)
    blocks.groupBy(col("url"))
      .agg(
        count(lit(1)).as("n_blocks"),
        count(when(col("keep"), 1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("keep"), struct(col("pos"), col("txt"))))),
          s => s("txt")), "\n").as("main_text"))
  }

  def lineDedup(docs: DataFrame, minDocs: Int,
                textCol: String = "text"): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val freq = lines.select(md5(col("line")).as("_h"), col("doc_id")).distinct()
      .groupBy("_h").agg(count(lit(1)).as("_docs"))
      .filter(col("_docs") >= minDocs)
      .select(col("_h"), lit(true).as("_boiler"))
    lines.withColumn("_h", md5(col("line")))
      .join(freq, Seq("_h"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("_boiler").isNull, 1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
          when(col("_boiler").isNull, struct(col("pos"), col("line"))))),
          s => s("line")), "\n").as("cleaned_text"))
  }
}
