package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Driver contract (SURVEY.md §7): one `queries` entry per implemented
 * operator family, each mirrored by DuckDB-runnable ANSI SQL in `oracleSql`
 * (column names and value types aligned exactly — sums over money use
 * round-to-cents BIGINT so results are order-independent integers, never
 * floating-point-accumulation-dependent).
 *
 * The KG-construction pipeline itself (graft.pipeline.KGPipeline) is not
 * SQL-expressible; its correctness gate is the planted-gold P/R test in
 * src/test (FIXTURES.md §2) and it appears here as rows-only entries
 * (q30_kg_*).
 */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** money -> exact integer cents. r6 (guide §1.2 step 2): Spark's
   *  round() on DOUBLE allocates two BigDecimals per row (Double.toString
   *  inside) — measured 22% of q01 (VariantProbe round vs floor). All
   *  money columns here are nonnegative 2-decimal values whose *100 sits
   *  within 1e-9 of an integer (checked across all three SFs), so
   *  floor(x*100 + 0.5) — a cast-truncation on a nonnegative value — is
   *  the same integer as the oracle's round-half-up, with no BigDecimal.
   *  The DuckDB side keeps its round() form; the driver hash-compares
   *  results, which pins the equivalence per run. */
  private def cents(c: org.apache.spark.sql.Column) =
    (c * 100 + 0.5).cast("long")

  /** helper fixing the lambda's type in Map literals */
  private def q(f: (SparkSession, String) => DataFrame)
      : (SparkSession, String) => DataFrame = f

  /** q61/q62 input: synthetic crawl pages (url + html) derived from the
   *  documents table with SQL-restatable arithmetic. Tag order in the
   *  <nav> block is fixed: root-relative, absolute (default port +
   *  tracking param), mailto (every 5th doc, must be dropped),
   *  directory-relative (every 4th doc). The absolute link's anchor
   *  alternates between a short and a long surface form (doc_id % 3) so
   *  anchor aggregation has real ranks to compute. */
  private def linkPages(docs: DataFrame): DataFrame = {
    val m = (k: Int) => (col("doc_id") % k).cast("string")
    docs.select(
      col("doc_id"),
      concat(lit("https://www.site"), m(7), lit(".com/dir"), m(3),
        lit("/page-"), col("doc_id").cast("string")).as("url"),
      concat(
        lit("<html><head><title>t</title></head><body><p>x</p><nav>"),
        lit("<a href=\"/page-"), m(50), lit("\">Hub "), m(50), lit("</a>"),
        lit("<a href=\"https://Other.org:443/a-"), m(11),
        lit("?utm_source=z&x=1\">"),
        when(col("doc_id") % 3 === 0, concat(lit("E"), m(11)))
          .otherwise(concat(lit("Entity "), m(11))),
        lit("</a>"),
        when(col("doc_id") % 5 === 0,
          lit("<a href=\"mailto:a@b.c\">mail</a>")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          lit("<a href=\"rel.html\">more</a>")).otherwise(lit("")),
        lit("</nav></body></html>")).as("html"))
  }

  /** q69/q70 input: pages whose line structure plants known per-host
   *  boilerplate — host h's nav line on every page (frac 1.0), a promo
   *  line on half its pages (frac 0.5 — exactly at the mine threshold),
   *  a deal line on a third (below threshold), a unique body line, and
   *  the doc's own 30-char prefix. */
  private def boilerPages(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("https://h"), (col("doc_id") % 5).cast("string"),
        lit(".com/p"), col("doc_id").cast("string")).as("url"),
      concat_ws("\n",
        concat(lit("nav h"), (col("doc_id") % 5).cast("string")),
        concat(lit("promo "), (col("doc_id") % 10).cast("string")),
        concat(lit("deal "), (col("doc_id") % 15).cast("string")),
        concat(lit("body "), col("doc_id").cast("string")),
        substring(col("text"), 1, 30)).as("text"))

  /** q75 input: pages whose html plants known block structure — a
   *  link-dense header div and promo div (dropped by density), a long
   *  article paragraph (kept), a short paragraph (dropped by length),
   *  and a footer (dropped by density). */
  private def contentPages(docs: DataFrame): DataFrame =
    docs.select(
      concat(lit("https://c"), (col("doc_id") % 5).cast("string"),
        lit(".com/p"), col("doc_id").cast("string")).as("url"),
      concat(
        lit("<html><body><div>menu <a href=\"/\">Home</a> <a href=\"/x\">"),
        lit("More links here</a></div>"),
        lit("<p>article body sentence "), col("doc_id").cast("string"),
        lit(" long enough to clear the floor easily "),
        substring(col("text"), 1, 40), lit("</p>"),
        lit("<p>short</p>"),
        lit("<div>promo <a href=\"/buy\">Buy item "),
        (col("doc_id") % 3).cast("string"), lit(" now</a></div>"),
        // uppercase markup on even docs: still split into its own block
        // and density-dropped — exercises the (?i) tag matching
        when(col("doc_id") % 2 === 0,
          lit("<DIV>UPPER promo block " +
            "<A HREF=\"/up\">Click this upper link now</A></DIV>"))
          .otherwise(lit("")),
        lit("<footer>site "), (col("doc_id") % 7).cast("string"),
        lit(" <a href=\"/tos\">Terms of service</a></footer>"),
        lit("</body></html>")).as("page_html"))

  /** Flagship: full KG pipeline over the synthetic corpus (driver
   *  smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val (pages, _) = graft.fixtures.PageGen.corpus(40)
    graft.pipeline.KGPipeline.run(spark, spark.createDataset(pages)).toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (SURVEY.md §2.10) ----
    "q01_pricing" -> q((s, d) => {
      import s.implicits._
      t(s, d, "lineitem").groupBy($"l_returnflag", $"l_linestatus").agg(
        sum($"l_quantity").as("sum_qty"),
        sum(cents($"l_extendedprice")).as("base_cents"),
        sum(cents($"l_extendedprice" * (lit(1) - $"l_discount"))).as("disc_cents"),
        count(lit(1)).as("n"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),
    "q02_noisyor" -> q((s, d) => {
      import s.implicits._
      // T2 noisy-or: 1 - prod(1-p) (Utils.java:287-291). Oracle-exact form:
      // discounts are centesimal, so prod(1-p) = prod(100-cents)/100^n is an
      // exact integer — immune to log/round/summation-order ulp noise (the
      // pipeline's log-domain variant is gated by ScalaTest instead).
      // Plan shape (round 4): the rank-filter window forced a full
      // shuffle + SORT of lineitem by a 5-column key before the group.
      // Groups are tiny (≤7 lineitems/order), so collect_list →
      // array_sort → slice computes the same per-group top-4 inside ONE
      // hash aggregate: same single exchange, no global sort, O(|group|)
      // per-group work. At 100 TB the sort was the scale hazard; the
      // hash agg is the shape that survives.
      // r6: cents via floor-cast, not round() — see the `cents` helper
      // (values identical: *100 is within 1e-9 of an integer on all SFs,
      // and the long/double ordering over exact integers is the same)
      t(s, d, "lineitem").select($"l_orderkey",
          struct($"l_linenumber", $"l_partkey", $"l_suppkey",
            cents($"l_extendedprice").as("pc"),
            cents($"l_discount").as("dc")).as("it"))
        .groupBy($"l_orderkey")
        .agg(slice(array_sort(collect_list($"it")), 1, 4).as("top"))
        .select($"l_orderkey",
          aggregate($"top", lit(1L),
            (acc, x) => acc * (lit(100L) - x.getField("dc").cast("long")))
            .as("inv_prod"),
          size($"top").cast("long").as("n"))
        .orderBy($"l_orderkey")
    }),
    "q03_argmax" -> q((s, d) => {
      import s.implicits._
      // X15 argmax-per-group with deterministic tiebreak — a hash
      // aggregate over an ordering-encoded struct (price desc, then
      // linenumber asc via negation), NOT a rank-filter window: no global
      // sort of the fact table (same round-4 plan shape as q02).
      // r6 (guide §2.3 "narrower types"): the struct's leading sort field
      // is price_cents (BIGINT) instead of the raw double — prices are
      // exact 2-decimal money (verified *100 integral across SFs), so the
      // cents ordering is the same total preorder and the duplicated
      // l_extendedprice field drops out of the shuffled struct.
      t(s, d, "lineitem")
        .select($"l_orderkey", struct(
            cents($"l_extendedprice").as("price_cents"),
            (-$"l_linenumber").as("nln"), $"l_partkey", $"l_linenumber").as("it"))
        .groupBy($"l_orderkey").agg(max($"it").as("m"))
        .select($"l_orderkey", $"m.l_partkey".as("l_partkey"),
          $"m.l_linenumber".as("l_linenumber"),
          $"m.price_cents".as("price_cents"))
        .orderBy($"l_orderkey")
    }),
    "q04_topk" -> q((s, d) => {
      import s.implicits._
      // T4 top-k per group without a global sort: collect_list →
      // array_sort → slice → posexplode (a customer's order list is
      // small); the rank column is the post-slice position. The window
      // version sorted the whole orders table by a 3-column key.
      t(s, d, "orders")
        .select($"o_custkey", struct((-$"o_totalprice").as("ntp"),
          $"o_orderkey").as("it"))
        .groupBy($"o_custkey")
        .agg(slice(array_sort(collect_list($"it")), 1, 3).as("top"))
        .select($"o_custkey", posexplode($"top"))
        .select($"o_custkey", $"col.o_orderkey".as("o_orderkey"),
          ($"pos" + 1).cast("int").as("rn"))
        .orderBy($"o_custkey", $"rn")
    }),
    "q05_star_join" -> q((s, d) => {
      import s.implicits._
      // star join: fact ⋈ broadcast dims (gazetteer-join shape, S5).
      // r6 (guide §2.3 "aggregate before you shuffle" + §3): the fact
      // side is pre-aggregated by its join key BEFORE any join — the
      // three per-row broadcast probes over the full fact table become
      // one map-side-combinable hash aggregate (|suppkey| rows reach the
      // joins instead of |lineitem|), and the three dimension hops are
      // collapsed into ONE broadcast (s_suppkey -> r_name) built from the
      // tiny dim-only join chain. Exact: l_quantity is integer-valued
      // (checked across SFs), so regrouped double sums are bit-exact, and
      // count/sum over disjoint suppkey groups re-sum losslessly.
      // r6 follow-up: THREE INDEPENDENT broadcasts instead of the chained
      // dim-join (supplier⋈nation⋈region collapsed first, then broadcast)
      // — the chain serialized three broadcast builds (each waiting on the
      // previous join's output); independent dimension broadcasts build
      // concurrently and the pre-aggregated fact side streams through all
      // three probes in one codegen stage. Dims are projected to their
      // key/payload columns so each broadcast carries only what the probe
      // reads. Measured 0.415 -> 0.364 s (VariantProbe, min of 6).
      t(s, d, "lineitem")
        .groupBy($"l_suppkey").agg(
          count(lit(1)).as("_n"), sum($"l_quantity").as("_sq"))
        .join(broadcast(t(s, d, "supplier").select($"s_suppkey", $"s_nationkey")),
          $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t(s, d, "nation").select($"n_nationkey", $"n_regionkey")),
          $"s_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, d, "region").select($"r_regionkey", $"r_name")),
          $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name").agg(
          sum($"_n").as("n"), sum($"_sq").as("sum_qty"))
        .orderBy($"r_name")
    }),
    "q06_anti_join" -> q((s, d) => {
      import s.implicits._
      // X6-style anti-join
      t(s, d, "customer").join(t(s, d, "orders"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name").orderBy($"c_custkey")
    }),
    "q07_semi_join" -> q((s, d) => {
      import s.implicits._
      t(s, d, "part").join(t(s, d, "lineitem"),
          $"p_partkey" === $"l_partkey", "left_semi")
        .groupBy($"p_brand").agg(count(lit(1)).as("n"))
        .orderBy($"p_brand")
    }),
    "q08_setops" -> q((s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".as("nk")).distinct()
        .except(t(s, d, "supplier").select($"s_nationkey".as("nk")).distinct())
        .orderBy($"nk")
    }),
    "q09_dedup" -> q((s, d) => {
      import s.implicits._
      t(s, d, "lineitem").select($"l_returnflag", $"l_linestatus")
        .distinct().orderBy($"l_returnflag", $"l_linestatus")
    }),
    "q10_strings" -> q((s, d) => {
      import s.implicits._
      // T10 string/scalar functions (levenshtein/md5 as in the reference's
      // Utils.levenshtein + gloss keys)
      t(s, d, "part").select($"p_partkey",
        levenshtein($"p_name", $"p_type").as("lev"),
        md5($"p_name").as("h"),
        upper($"p_brand").as("b"),
        length($"p_name").as("len"))
        .orderBy($"p_partkey")
    }),
    "q11_running" -> q((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders").select($"o_custkey", $"o_orderkey",
          sum(cents($"o_totalprice")).over(w).as("run_cents"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),
    "q12_events_hourly" -> q((s, d) => {
      import s.implicits._
      t(s, d, "events")
        .groupBy(date_trunc("hour", $"ts").as("h"), $"event_type").agg(
          count(lit(1)).as("n"), sum(cents($"value")).as("value_cents"))
        .orderBy($"h", $"event_type")
    }),

    // ---- training-data pipeline ops over `documents` ----
    "q13_docs_tokens" -> q((s, d) => {
      import s.implicits._
      t(s, d, "documents").select($"doc_id",
        regexp_count($"text", lit("\\S+")).cast("int").as("n_tokens"),
        $"n_chars")
        .orderBy($"doc_id")
    }),
    // BPE-ish subword counting (the GPT-2-style pre-tokenizer shape) —
    // separate from q13 so the headline token-count timing stays
    // comparable across rounds
    "q34_docs_subwords" -> q((s, d) => {
      import s.implicits._
      t(s, d, "documents").select($"doc_id",
        graft.text.TextStats.subwordCount($"text").as("n_subwords"))
        .orderBy($"doc_id")
    }),
    // true rolling-hash (Rabin-Karp min over sliding char 8-grams) —
    // exact integer arithmetic the oracle recomputes term by term
    "q35_docs_rollhash" -> q((s, d) => {
      import s.implicits._
      t(s, d, "documents").select($"doc_id",
        graft.text.TextStats.rollingMin($"text").as("roll_min"))
        .orderBy($"doc_id")
    }),
    "q14_docs_fingerprint" -> q((s, d) => {
      import s.implicits._
      // rolling/normalized document fingerprint
      t(s, d, "documents").select($"doc_id",
        md5(regexp_replace(lower($"text"), "[^a-z0-9]", "")).as("fp"))
        .orderBy($"doc_id")
    }),
    "q15_docs_dedup_exact" -> q((s, d) => {
      import s.implicits._
      // exact dedup: hash-groupBy, keep min doc_id per content hash
      t(s, d, "documents").groupBy(md5($"text").as("h")).agg(
        count(lit(1)).as("n"), min($"doc_id").as("keep_id"))
        .orderBy($"h")
    }),
    "q16_docs_quality" -> q((s, d) => {
      import s.implicits._
      // quality scoring: length/alpha/space ratios (int-exact numerators)
      val alpha = length(regexp_replace($"text", "[^a-zA-Z]", ""))
      val spaces = length($"text") - length(regexp_replace($"text", " ", ""))
      t(s, d, "documents").select($"doc_id",
        alpha.as("alpha"),
        spaces.as("spaces"),
        (alpha.cast("double") / $"n_chars".cast("double")).as("alpha_ratio"))
        .orderBy($"doc_id")
    }),
    "q17_docs_langid" -> q((s, d) => {
      import s.implicits._
      // n-gram/stopword language-ID heuristic (deterministic rule ladder)
      val txt = concat(lit(" "), lower($"text"), lit(" "))
      val en = txt.contains(" the ") || txt.contains(" and ") || txt.contains(" a ")
      val de = txt.contains(" der ") || txt.contains(" und ") || txt.contains(" die ")
      val fr = txt.contains(" le ") || txt.contains(" la ") || txt.contains(" et ")
      val es = txt.contains(" el ") || txt.contains(" los ") || txt.contains(" y ")
      val zh = $"text".rlike("[\\u4e00-\\u9fff]")
      t(s, d, "documents").select($"doc_id",
        when(zh, "zh").when(de, "de").when(fr, "fr").when(es, "es")
          .when(en, "en").otherwise("und").as("pred_lang"),
        $"lang")
        .orderBy($"doc_id")
    }),
    "q18_docs_jaccard" -> q((s, d) => {
      import s.implicits._
      // word-set Jaccard near-dup join (shingle n=1): per-doc distinct ->
      // df-cap -> self-join on shared token -> |∩|/|∪|. The doc-frequency
      // cap drops stop-words shared by >maxDf docs BEFORE the self-join —
      // without it the join is quadratic on ubiquitous tokens (the library
      // twin NearDup.ngramJaccard applies the same cap); set sizes are
      // computed on the SAME capped token sets so the oracle mirrors exactly.
      // r6 (guide §2.4): the former `.distinct()` over the exploded
      // (doc_id, word) stream shuffled the whole token table just to dedup
      // WITHIN docs — array_distinct computes the same per-doc set
      // row-locally, removing that exchange outright; and the surviving
      // token table is materialized ONCE (the q19 localCheckpoint pattern)
      // instead of being re-derived for each of its four consumers
      // (plan was 46 Exchanges / 8 parquet scans; now 1 scan).
      val maxDf = 100
      val wAll = t(s, d, "documents")
        .select($"doc_id", explode(array_distinct(split($"text", " "))).as("word"))
      val rare = wAll.groupBy($"word").agg(count(lit(1)).as("df"))
        .filter($"df" <= maxDf)
      val w = wAll.join(rare.select($"word"), Seq("word"), "left_semi")
        .localCheckpoint(true)
      val sz = w.groupBy($"doc_id").agg(count(lit(1)).as("n"))
      val inter = w.as("a").join(w.as("b"),
          $"a.word" === $"b.word" && $"a.doc_id" < $"b.doc_id")
        .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
        .agg(count(lit(1)).as("i"))
      inter.join(sz.as("sa"), $"d1" === $"sa.doc_id")
        .join(sz.as("sb"), $"d2" === $"sb.doc_id")
        .select($"d1", $"d2", $"i",
          ($"i".cast("double") / ($"sa.n" + $"sb.n" - $"i").cast("double")).as("jac"))
        .filter($"jac" >= 0.9)
        .select($"d1", $"d2", $"i")
        .orderBy($"d1", $"d2")
    }),
    // MinHash+LSH near-dup candidate edges (star edges per band, linear in
    // bucket size — the degenerate-bucket story lives on the shared impl,
    // dedup/NearDup.minhashStarEdges)
    "q19_docs_minhash_lsh" -> q((s, d) =>
      graft.dedup.NearDup.minhashStarEdges(s, t(s, d, "documents"))
        .orderBy(col("d1"), col("d2"))),
    // end-to-end crawl dedup: q19's edges -> connected components ->
    // canonical election (max tokens, min doc_id) -> keep/drop verdict
    // for every doc; the oracle closes the same star edges with a
    // recursive CTE and elects with the same ordering
    "q38_docs_dedup_cluster" -> q((s, d) =>
      graft.dedup.NearDup.dedupClusters(s, t(s, d, "documents"))),
    // deterministic stratified sample: k smallest md5(doc_id) per lang —
    // two-phase (salted partial top-k, then exact top-k over the bounded
    // remainder) so no stratum is ever sorted in one task
    "q39_docs_sample_stratified" -> q((s, d) => {
      import s.implicits._
      graft.text.Curation.stratifiedSample(
          t(s, d, "documents"), "lang", k = 20)
        .select($"doc_id", $"lang").orderBy($"doc_id")
    }),
    // token-budget shard packing via a DISTRIBUTED prefix sum (per-block
    // running sums + a tiny cumulative offset table — never one global
    // unpartitioned window); blockSize 100 so sf0.01 exercises >1 block
    "q40_docs_pack_shards" -> q((s, d) =>
      graft.text.Curation.packShards(s, t(s, d, "documents"),
        budget = 2000L, blockSize = 100L)),
    // per-doc TF-IDF salient terms, ranked integer-exactly (tf DESC,
    // df ASC, term ASC) so no float rounding can flip the row set; the
    // per-doc window partitions are bounded by a doc's distinct terms
    "q41_docs_salient_terms" -> q((s, d) =>
      graft.text.TextStats.salientTerms(t(s, d, "documents"), k = 3)
        .orderBy(col("doc_id"), col("term_rank"))),
    // Gopher-style repetition quality signals: every number is a ratio
    // of integer counts, so both engines agree to the last bit
    "q42_docs_repetition" -> q((s, d) =>
      graft.text.TextStats.repetitionSignals(t(s, d, "documents"))
        .orderBy(col("doc_id"))),
    // benchmark-contamination tagging: docs with doc_id % 97 == 0 stand
    // in for the eval benchmark; its distinct 3-gram shingle set is
    // broadcast against the corpus side
    "q43_docs_contamination" -> q((s, d) => {
      val docs = t(s, d, "documents")
      graft.text.Curation.contamination(
          docs, docs.filter(col("doc_id") % 97 === 0), n = 3)
        .orderBy(col("doc_id"))
    }),
    // URL-canonicalization recrawl dedup: each doc stands in for one
    // crawl capture of a deterministic URL (7 hosts x 13 pages; docs
    // with doc_id % 3 == 0 add a tracking query + trailing slash), with
    // warc_ts = doc_id; keep the NEWEST capture per canonical URL
    "q44_url_latest_crawl" -> q((s, d) => {
      val caps = t(s, d, "documents").select(
        col("doc_id"),
        concat(lit("HTTPS://WWW.Site"), (col("doc_id") % 7).cast("string"),
          lit(".COM:443/Page"), (col("doc_id") % 13).cast("string"),
          when(col("doc_id") % 3 === 0,
            concat(lit("/?utm_source=x&ref="),
              (col("doc_id") % 5).cast("string")))
            .otherwise(lit(""))).as("url"),
        col("doc_id").as("warc_ts"))
      graft.text.Curation.latestCrawl(caps)
        .select(col("canonical_url"), col("doc_id").as("kept_doc_id"),
          col("n_crawls"))
        .orderBy(col("canonical_url"))
    }),
    // PII detection/redaction: deterministic emails (doc_id%2==0), phones
    // (doc_id%3==0) and IPv4s (doc_id%5==0) appended to the doc text;
    // counts over the original text, sequential email->phone->ip
    // redaction — pure codegen'd column exprs, no shuffle
    "q45_pii_redact" -> q((s, d) => {
      val withPii = t(s, d, "documents").select(
        col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 2 === 0,
            concat(lit(" contact user"), (col("doc_id") % 7).cast("string"),
              lit("@mail"), (col("doc_id") % 3).cast("string"), lit(".com")))
            .otherwise(lit("")),
          when(col("doc_id") % 3 === 0,
            concat(lit(" call 800-555-"),
              lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
            .otherwise(lit("")),
          when(col("doc_id") % 5 === 0,
            concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
              lit(".0."), (col("doc_id") % 200).cast("string")))
            .otherwise(lit(""))).as("text"))
      graft.text.Curation.piiSignals(withPii)
        .select(col("doc_id"), col("n_emails"), col("n_phones"),
          col("n_ipv4"), col("n_pii"), col("has_pii"), col("redacted_text"))
        .orderBy(col("doc_id"))
    }),
    // per-registered-domain rollup + blocklist flag: 7 synthetic domains,
    // doc_id%11==0 pages sit on a cdn. subdomain so n_hosts is 2 for the
    // domains that have one; two keyed aggs, both map-side combinable
    "q46_domain_stats" -> q((s, d) => {
      val pages = t(s, d, "documents").select(
        concat(lit("https://www."),
          when(col("doc_id") % 11 === 0, lit("cdn.")).otherwise(lit("")),
          lit("site"), (col("doc_id") % 7).cast("string"),
          lit(".com/page"), (col("doc_id") % 13).cast("string")).as("url"),
        col("text"))
      graft.text.Curation.domainStats(pages,
          blocklist = Seq("site2.com", "site5.com"))
        .orderBy(col("domain"))
    }),
    // CCNet-style line-level boilerplate removal: every doc is 5 lines —
    // a universal cookie banner, a 4-variant nav line, a 7-variant
    // copyright line (all boilerplate at minDocs=50 on sf>=0.01) plus a
    // near-unique text prefix and a unique body line that survive;
    // frequent-line table is joined on md5(line), AQE-broadcast-sized
    "q47_line_dedup" -> q((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"),
        concat_ws("\n",
          lit("COOKIE BANNER accept all cookies"),
          concat(lit("nav home products about "),
            (col("doc_id") % 4).cast("string")),
          substring(col("text"), 1, 40),
          concat(lit("doc "), col("doc_id").cast("string"),
            lit(" body line")),
          concat(lit("copyright site"),
            (col("doc_id") % 7).cast("string"))).as("text"))
      graft.text.Curation.lineDedup(docs, minDocs = 50)
        .orderBy(col("doc_id"))
    }),
    // per-node triangle counts over a deterministic ring+chord graph
    // (every consecutive id trio closes a triangle; chords into a 101-node
    // core add irregular ones) — degree-oriented wedge enumeration, the
    // oracle recounts with a naive a<b<c 3-way self-join
    "q48_graph_triangles" -> q((s, d) => {
      val ids = t(s, d, "documents").select(col("doc_id").as("i"))
      val edges = ids.select(col("i").as("src"), (col("i") + 1).as("dst"))
        .union(ids.select(col("i").as("src"), (col("i") + 2).as("dst")))
        .union(ids.select(col("i").as("src"),
          ((col("i") * 17 + 5) % 101).as("dst")))
      graft.link.GraphOps.triangleCounts(s, edges)
        .orderBy(col("node"))
    }),
    // integer fixed-point PageRank (3 iterations, d=85/100, scale 10^12)
    // over the same ring+chord graph as q48 — the chords make the 101-node
    // core high-in-degree hubs; every step is BIGINT floor division so the
    // oracle restates the recurrence bit-for-bit as chained CTEs
    "q49_pagerank" -> q((s, d) => {
      val ids = t(s, d, "documents").select(col("doc_id").as("i"))
      val edges = ids.select(col("i").as("src"), (col("i") + 1).as("dst"))
        .union(ids.select(col("i").as("src"), (col("i") + 2).as("dst")))
        .union(ids.select(col("i").as("src"),
          ((col("i") * 17 + 5) % 101).as("dst")))
      graft.link.GraphOps.pageRank(s, edges, iters = 3)
        .orderBy(col("node"))
    }),
    // duplicated-span stats (Lee et al. 2021 shape, n=8): doc_id%3==0 docs
    // get a shared 10-token boilerplate suffix (3 duplicated 8-gram
    // positions each); natural text may add more; docs shorter than 8
    // tokens report NULL fraction
    "q50_dup_spans" -> q((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            lit(" all rights reserved terms of service apply contact us today"))
            .otherwise(lit(""))).as("text"))
      graft.dedup.NearDup.dupSpans(s, docs, n = 8)
        .orderBy(col("doc_id"))
    }),
    // corpus vocabulary: top-100 words by (count DESC, word ASC) with
    // cumulative coverage — integer counts, one double division per row
    "q51_vocab" -> q((s, d) =>
      graft.text.TextStats.vocabulary(t(s, d, "documents"), k = 100)
        .orderBy(col("rank"))),
    // gap-based sessionization over the events table (30-min gap);
    // session boundaries are exact integer microsecond arithmetic both
    // engines state identically
    "q52_sessions" -> q((s, d) =>
      graft.ops.Sessions.sessionize(t(s, d, "events"), gapMinutes = 30)
        .orderBy(col("user_id"), col("session_id"))),
    // conjunctive keyword search: docs containing ALL of three query
    // terms, with matched-term/total/min tf — integer counts only
    "q53_search" -> q((s, d) =>
      graft.text.Search.searchAll(t(s, d, "documents"),
        Seq("vector", "join", "window"))
        .orderBy(col("doc_id"))),
    // KMV distinct-count sketch over the vocabulary: 48-bit md5 prefixes,
    // k=16 minima; single IEEE division of double-exact integers
    "q54_kmv_distinct" -> q((s, d) =>
      graft.text.Sketches.kmvDistinctWords(t(s, d, "documents"), k = 16)),
    // skip-gram co-occurrence counts at window 2, minCount 2 —
    // pure integer pair counts, canonical (least, greatest) order
    "q55_cooccurrence" -> q((s, d) =>
      graft.text.TextStats.cooccurrence(t(s, d, "documents"),
        window = 2, minCount = 2)
        .orderBy(col("w1"), col("w2"))),
    // LSH candidate verification: edit distance over 256-char prefixes
    // of every MinHash star-edge pair; verdict is an integer compare
    "q56_verify_pairs" -> q((s, d) =>
      graft.dedup.NearDup.verifyCandidatePairs(s, t(s, d, "documents"),
        capChars = 256)
        .orderBy(col("d1"), col("d2"))),
    // exact length-distribution percentiles (50/90/99) via the length
    // histogram — ceil-rank quantiles, all-BIGINT bracket test
    "q57_len_quantiles" -> q((s, d) =>
      graft.text.TextStats.lengthQuantiles(t(s, d, "documents"),
        qs = Seq(50, 90, 99))),
    // k-core peeling (k=4, 3 fixed rounds) over the same ring+chord
    // graph as q48/q49 — the ring tail peels and cascades inward
    "q58_kcore" -> q((s, d) => {
      val ids = t(s, d, "documents").select(col("doc_id").as("i"))
      val edges = ids.select(col("i").as("src"), (col("i") + 1).as("dst"))
        .union(ids.select(col("i").as("src"), (col("i") + 2).as("dst")))
        .union(ids.select(col("i").as("src"),
          ((col("i") * 17 + 5) % 101).as("dst")))
      graft.link.GraphOps.kCore(s, edges, k = 4, rounds = 3)
        .orderBy(col("node"))
    }),
    // dedup cluster-size histogram over the q38 clustering
    "q59_cluster_sizes" -> q((s, d) =>
      graft.dedup.NearDup.clusterSizeHistogram(s, t(s, d, "documents"))
        .orderBy(col("cluster_size"))),
    // bigram next-word table: top-3 successors per word at minCount 2
    "q60_bigrams" -> q((s, d) =>
      graft.text.TextStats.bigramNextWords(t(s, d, "documents"),
        topK = 3, minCount = 2)
        .orderBy(col("w1"), col("rank"))),
    // hyperlink extraction from raw html: each doc stands in for one page
    // whose <nav> block carries a root-relative link, an absolute link
    // with a default port + tracking param, and (every 4th/5th doc) a
    // directory-relative / mailto: href — extraction, resolution and
    // canonicalization are pure column exprs the oracle restates in RE2
    "q61_extract_links" -> q((s, d) =>
      graft.text.Links.extractLinks(linkPages(t(s, d, "documents")))
        .orderBy(col("src_url"), col("pos"))),
    // anchor-text aggregation (mined alias dictionary): top-3 anchors per
    // destination by (count DESC, anchor ASC); the absolute link's anchor
    // alternates between two surface forms so destinations genuinely rank
    "q62_anchor_stats" -> q((s, d) =>
      graft.text.Links.anchorStats(
        graft.text.Links.extractLinks(linkPages(t(s, d, "documents"))),
        k = 3)
        .orderBy(col("dst_url"), col("rank"))),
    // crawl-snapshot delta: snapshot A omits doc_id%10==9 (those are "new"
    // in B), snapshot B omits %10==7 ("deleted") and rewrites the text of
    // %5==0 pages ("changed"); the rest are "unchanged" — one full-outer
    // join on url carrying only (url, md5) rows
    "q63_crawl_delta" -> q((s, d) => {
      val docs = t(s, d, "documents")
      val url = concat(lit("https://s"), (col("doc_id") % 7).cast("string"),
        lit(".com/p"), col("doc_id").cast("string"))
      val a = docs.filter(col("doc_id") % 10 =!= 9)
        .select(url.as("url"), col("text"))
      val b = docs.filter(col("doc_id") % 10 =!= 7)
        .select(url.as("url"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" updated")))
            .otherwise(col("text")).as("text"))
      graft.text.Curation.crawlDelta(a, b).orderBy(col("url"))
    }),
    // host-level rollup of the q61 link graph: one keyed aggregate over
    // the extracted edges (count map-side combinable, distinct pages via
    // the two-phase rewrite), is_internal = same-host flag
    "q64_host_graph" -> q((s, d) =>
      graft.text.Links.hostGraph(
        graft.text.Links.extractLinks(linkPages(t(s, d, "documents"))))
        .orderBy(col("src_host"), col("dst_host"))),
    // crawl frontier: uncrawled q61 destinations ranked by distinct
    // referring pages; crawled set = every page's own canonical url plus
    // the Other.org targets with doc_id%11 < 6 (simulating fetched) —
    // top-20 by the deterministic (n_refs DESC, dst_url ASC) order
    "q66_frontier" -> q((s, d) => {
      val docs = t(s, d, "documents")
      val links = graft.text.Links.extractLinks(linkPages(docs))
      val crawled = links.select(col("src_url").as("url")).distinct()
        .unionByName(docs.filter(col("doc_id") % 11 < 6)
          .select(concat(lit("https://other.org/a-"),
            (col("doc_id") % 11).cast("string"), lit("?x=1")).as("url"))
          .distinct())
      graft.text.Links.frontier(links, crawled, k = 20)
        .orderBy(col("n_refs").desc, col("dst_url"))
    }),
    // URL-template mining: 4 hosts × 3 path families (item/{N}?page={N},
    // post-{N}, a static page) — digit runs collapse and the crawl's
    // shape drops out as 12 template rows with counts
    "q71_url_templates" -> q((s, d) => {
      val u = t(s, d, "documents").select(
        concat(lit("https://t"), (col("doc_id") % 4).cast("string"),
          lit(".com"),
          when(col("doc_id") % 3 === 0,
            concat(lit("/item/"), col("doc_id").cast("string"),
              lit("?page="), (col("doc_id") % 7).cast("string")))
            .when(col("doc_id") % 3 === 1,
              concat(lit("/post-"), col("doc_id").cast("string")))
            .otherwise(lit("/static/about"))).as("url"))
      graft.text.Links.urlTemplates(u)
        .orderBy(col("host"), col("template"))
    }),
    // robots-style URL rules, longest-prefix wins, disallow on ties;
    // r0: /a disallowed except the /a/1* subtree; r1: everything
    // disallowed except /b; r2: no rules -> default allow
    "q72_url_rules" -> q((s, d) => {
      import s.implicits._
      val urls = t(s, d, "documents").select(
        concat(lit("https://r"), (col("doc_id") % 3).cast("string"),
          lit(".com"),
          when(col("doc_id") % 2 === 0, lit("/a/")).otherwise(lit("/b/")),
          (col("doc_id") % 20).cast("string")).as("url"))
      val rules = Seq(
        ("r0.com", "/a", false), ("r0.com", "/a/1", true),
        ("r1.com", "/", false), ("r1.com", "/b", true))
        .toDF("host", "path_prefix", "allow")
      graft.text.Links.applyUrlRules(urls, rules).orderBy(col("url"))
    }),
    // largest-remainder crawl-budget apportionment over per-host demand
    // (sum of doc_id%13 per host — uneven on purpose); exact long
    // arithmetic end to end, allocation sums to exactly the budget
    "q73_crawl_budget" -> q((s, d) => {
      val demand = t(s, d, "documents")
        .groupBy(concat(lit("h"), (col("doc_id") % 7).cast("string"))
          .as("host"))
        .agg(sum(col("doc_id") % 13).as("demand"))
      graft.text.Links.crawlBudget(demand, 1000L).orderBy(col("host"))
    }),
    // pairwise clustering P/R/F1 from contingency cells (never pair
    // enumeration): pred = doc_id%40 vs gold = doc_id%50
    "q74_cluster_metrics" -> q((s, d) =>
      graft.link.GraphOps.clusterPairMetrics(
        t(s, d, "documents").select(col("doc_id").as("id"),
          (col("doc_id") % 40).as("pred_cluster"),
          (col("doc_id") % 50).as("gold_cluster")))),
    // boilerpipe-style main-content extraction: planted block structure
    // (link-dense header/promo/footer dropped, long article kept, short
    // paragraph dropped) — integer length/density thresholds only
    "q75_main_content" -> q((s, d) =>
      graft.text.Curation.mainContent(contentPages(t(s, d, "documents")),
        htmlCol = "page_html")
        .orderBy(col("url"))),
    // BFS crawl depth over the q58 arithmetic graph from seeds {0, 7}:
    // min hop count per reachable node within 4 hops
    "q77_crawl_depth" -> q((s, d) => {
      val ids = t(s, d, "documents").select(col("doc_id").as("i"))
      val edges = ids.select(col("i").as("src"), (col("i") + 1).as("dst"))
        .union(ids.select(col("i").as("src"), (col("i") + 2).as("dst")))
        .union(ids.select(col("i").as("src"),
          ((col("i") * 17 + 5) % 101).as("dst")))
      val seeds = ids.filter(col("i").isin(0, 7)).select(col("i").as("node"))
      graft.link.GraphOps.bfsDepth(s, edges, seeds, maxDepth = 4)
        .orderBy(col("node"))
    }),
    // LSH-candidate near-dup with exact verification: q19's star edges
    // scored with exact 3-gram Jaccard (no df cap, no all-pairs) —
    // the shape that retires ngramJaccard's within-shingle pair join
    "q78_jaccard_star" -> q((s, d) => {
      import s.implicits._
      graft.dedup.NearDup.ngramJaccardStar(s, t(s, d, "documents"),
        n = 3, threshold = 0.2)
        .select($"d1", $"d2", round($"jaccard", 5).as("jaccard"))
        .orderBy($"d1", $"d2")
    }),
    // BPE round-1 statistics: weighted adjacent character-pair counts
    // over the word-frequency table (the aggregation every merge round
    // of Bpe.trainMerges runs; the full iterative trainer is spec-gated
    // against a single-JVM reference in BpeSpec) — top-50 deterministic
    "q76_bpe_pairs" -> q((s, d) =>
      graft.text.Bpe.pairCounts(graft.text.Bpe.symbolize(
        graft.text.Bpe.wordFreq(t(s, d, "documents"))))
        .orderBy(col("n").desc, col("l"), col("r")).limit(50)),
    // slowly-changing-fact intervals: timestamped (subj, pred, obj)
    // observations derived from the events stream by id arithmetic;
    // consecutive same-object runs collapse to validity intervals
    // (valid_to = next run's start, NULL while current)
    "q67_fact_intervals" -> q((s, d) => {
      val obs = t(s, d, "events").select(
        concat(lit("e"), (col("user_id") % 40).cast("string")).as("subj"),
        concat(lit("p"), (col("event_id") % 3).cast("string")).as("pred"),
        concat(lit("org"), (col("event_id") % 5).cast("string")).as("obj"),
        col("ts"))
      graft.link.Temporal.factIntervals(obs)
        .orderBy(col("subj"), col("pred"), col("valid_from"), col("obj"))
    }),
    // KG build-to-build delta: two triple builds over overlapping document
    // slices (B drops %10==7, rescores %5==0, gains %10==9), diffed on the
    // triple key — the changelog an incremental-recrawl round publishes
    "q68_kg_delta" -> q((s, d) => {
      val docs = t(s, d, "documents")
      def build(df: DataFrame, bump: org.apache.spark.sql.Column) = df
        .select(
          concat(lit("e"), (col("doc_id") % 30).cast("string")).as("subj"),
          concat(lit("p"), (col("doc_id") % 4).cast("string")).as("pred"),
          concat(lit("v"), (col("doc_id") % 6).cast("string")).as("obj"),
          ((col("doc_id") % 97) + bump).as("raw"))
        .groupBy(col("subj"), col("pred"), col("obj"))
        .agg((max(col("raw")) / 100.0).as("score"))
      val a = build(docs.filter(col("doc_id") % 10 =!= 9), lit(0))
      val b = build(docs.filter(col("doc_id") % 10 =!= 7),
        when(col("doc_id") % 5 === 0, lit(1)).otherwise(lit(0)))
      graft.link.Temporal.kgDelta(a, b)
        .orderBy(col("subj"), col("pred"), col("obj"))
    }),
    // per-host boilerplate mining: every page of host h carries the
    // host-wide nav line (frac 1.0, mined) and a promo line shared by
    // ~half the host's pages (frac 0.5, exactly at the threshold) or
    // ~a third (doc_id%15 variant, below threshold — NOT mined), plus
    // unique body lines that never qualify
    "q69_boilerplate" -> q((s, d) =>
      graft.text.Curation.hostBoilerplate(boilerPages(t(s, d, "documents")))
        .orderBy(col("host"), col("line"))),
    // template removal with the mined table: cleaned pages keep order,
    // counts pin how many lines each page lost
    "q70_strip_boilerplate" -> q((s, d) => {
      val pages = boilerPages(t(s, d, "documents"))
      graft.text.Curation.stripBoilerplate(pages,
        graft.text.Curation.hostBoilerplate(pages))
        .orderBy(col("url"))
    }),
    // C4-style global first-occurrence span dedup: each doc is 4 lines —
    // a 5-variant quote and a 7-variant footer (kept only by the corpus-
    // order-first doc), a unique body line and a near-unique text prefix
    "q65_span_dedup" -> q((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"),
        concat_ws("\n",
          concat(lit("quote "), (col("doc_id") % 5).cast("string")),
          concat(lit("doc "), col("doc_id").cast("string"),
            lit(" unique body")),
          substring(col("text"), 1, 40),
          concat(lit("footer "), (col("doc_id") % 7).cast("string")))
          .as("text"))
      graft.text.Curation.spanDedup(docs).orderBy(col("doc_id"))
    }),
    "q20_embed_topk" -> q((s, d) => {
      import s.implicits._
      // brute-force cosine top-k ANN baseline over ARRAY<FLOAT>
      val e = t(s, d, "embeddings")
      // r6: dimension-sized driver fetch (the q27 centroid precedent) —
      // the query vector and its squared norm are constants of the scan;
      // the former 1-row broadcast crossJoin existed only to carry them,
      // and normSq(qe) re-paid d multiply-adds per corpus row for a
      // constant. The driver fold below is the same left fold as
      // vec.normSq (float widened to double, ascending index), so the
      // value — and every rounded cosine — is bit-identical.
      val qArr = e.filter($"vec_id" === 0)
        .select($"embedding").collect()(0).getSeq[Float](0)
      var nbv = 0.0
      qArr.foreach { x => nbv += x.toDouble * x.toDouble }
      // fused native kernels — codegen'd, bit-identical to the HOF folds
      // they replace (functions/VectorExpressions.scala, VectorExprSpec)
      val dot = graft.functions.vec.dot($"embedding", typedLit(qArr))
      val na = graft.functions.vec.normSq($"embedding")
      e.filter($"vec_id" =!= 0)
        .select($"vec_id", round(dot / sqrt(na * lit(nbv)), 5).as("cos"))
        .orderBy($"cos".desc, $"vec_id").limit(10)
    }),
    // multimodal plumbing with REAL image decodes on the driver-visible
    // path: every 5th payload is a generated PNG javax.imageio must
    // actually decode; all output columns are id-arithmetic, so the
    // oracle covers both paths (the 19-dim feature/histogram shape is
    // gated by ModulesSpec)
    "q23_media_features" -> q((s, d) =>
      graft.multimodal.Multimodal.featureQuery(s, d)),
    // IVF ANN probe with the deterministic sampled-centroid quantizer —
    // the whole path (assignment argmin, probe-list selection, list-pruned
    // cosine top-k) is mirrored row-for-row by the DuckDB oracle; the
    // k-means quantizer + fit/probe split is spec-gated (DedupSpec)
    "q27_embed_ivf" -> q((s, d) =>
      graft.dedup.NearDup.ivfSampleTopK(s, t(s, d, "embeddings"),
        queryId = 0L, k = 10, nLists = 8, nProbe = 3)),
    // G3 transitive completion, oracle-checked: depth-3 closure over a
    // deterministic graph derived from `supplier` (a binary subsidiary
    // tree k -> 2k, 2k+1 plus an org:member_of chain k -> k+1). Every
    // edge score is a power of 2 (0.5 / 0.25), so every path product is
    // an EXACT double on both engines and the closure rows hash-compare
    // bit-for-bit. In a tree/chain each (subj,obj) pair has one path, so
    // the first-depth-wins anti-join semantics are decidable in SQL.
    "q28_graph_closure" -> q((s, d) => {
      import s.implicits._
      val g = graphFixture(s, d)
      graft.link.GraphOps.transitiveClosure(s,
          g.subsidiaries.unionByName(g.members))
        .select($"subj", $"pred", $"obj", round($"score", 6).as("score"))
        .orderBy($"subj", $"pred", $"obj")
    }),
    // G5 weighted Horn-rule inference, oracle-checked: two rules
    // (subsidiary-of-subsidiary; employee-of-subsidiary lifts to parent)
    // applied depth-3 over the subsidiary tree + one employee edge per
    // org. Rule weights are powers of 2 for the same FP-exactness reason;
    // a triple re-derivable through two intermediates keeps BOTH score
    // rows (distinct is over (subj,pred,obj,score)) — mirrored in SQL.
    "q29_graph_rules" -> q((s, d) => {
      import s.implicits._
      val g = graphFixture(s, d)
      val rules = Seq(
        graft.link.RuleInference.Rule(
          "org:subsidiaries", "org:subsidiaries", "org:subsidiaries", 0.5),
        graft.link.RuleInference.Rule(
          "org:subsidiaries", "org:top_members/employees",
          "org:top_members/employees", 0.25))
      graft.link.RuleInference.infer(s,
          g.subsidiaries.unionByName(g.employees), rules, depth = 3)
        .select($"subj", $"pred", $"obj", round($"score", 6).as("score"))
        .orderBy($"subj", $"pred", $"obj", $"score")
    }),
    // G6 connected components, oracle-checked: intra-decade chains
    // (k -> k+1 while in the same decade of supplier keys) plus one
    // mid-decade spoke (k%10==5 -> decade anchor). Supplier keys are
    // contiguous, so each decade is one component whose fixpoint label is
    // closed-form — the decade minimum over the vertex set — which the
    // oracle computes directly; the chain's diameter (~9) forces real
    // multi-round min-label propagation, not a 1-hop star collapse.
    "q32_graph_cc" -> q((s, d) => {
      import s.implicits._
      val sup = t(s, d, "supplier").select($"s_suppkey".cast("long").as("k"))
      val keys = sup.select($"k".as("dst"))
      def exists(df: DataFrame) = df.join(keys, Seq("dst"), "left_semi")
      val chain = exists(sup.filter($"k" % 10 =!= 9)
        .select($"k".as("src"), ($"k" + 1).as("dst")))
      val spoke = exists(sup.filter($"k" % 10 === 5)
        .select($"k".as("src"), ($"k" - 5).as("dst")))
      graft.link.GraphOps.connectedComponents(s, chain.unionByName(spoke))
        .orderBy($"v")
    }),
    // T7 threshold sweep -> P/R curve, oracle-checked: deterministic
    // scores/gold from `orders`, then the one-pass bucketed sweep
    // (bucket counts + reverse cumulative sums). The oracle transcribes
    // the same bucketing (truncate-toward-zero on a nonnegative score,
    // so floor()), cumulative window, and the exact f1 operation order.
    "q33_pr_sweep" -> q((s, d) => {
      import s.implicits._
      val o = t(s, d, "orders")
      val scored = o.select($"o_custkey".as("subj"), lit("rel").as("pred"),
        $"o_orderkey".as("obj"),
        (($"o_orderkey" % 100).cast("double") / 100.0).as("score"))
      val gold = o.filter($"o_orderkey" % 3 === 0)
        .select($"o_custkey".as("subj"), lit("rel").as("pred"),
          $"o_orderkey".as("obj"))
      graft.evaluate.Evaluate.thresholdSweep(s, scored, gold)
        .select($"threshold", $"responses", $"correct",
          round($"precision", 6).as("precision"),
          round($"recall", 6).as("recall"),
          round($"f1", 6).as("f1"))
        .orderBy($"threshold")
    }),
    // multimodal audio: every 3rd payload a generated PCM WAV that
    // javax.sound.sampled REALLY decodes (rate/frames/duration and the
    // exact constant-amplitude RMS are id-arithmetic, full oracle); the
    // rest exercise the undecodable fallback
    "q36_audio_features" -> q((s, d) =>
      graft.multimodal.Multimodal.audioQuery(s, d)),
    // multimodal video: every id%4==1 payload an RVID clip the bounded
    // frame sampler really demuxes (dimensions/frame counts/first+last
    // sampled-frame solid-color means are id-arithmetic, full oracle)
    "q37_video_features" -> q((s, d) =>
      graft.multimodal.Multimodal.videoQuery(s, d))
  ) ++ moduleQueries

  private final case class GraphFixture(subsidiaries: DataFrame,
                                        members: DataFrame,
                                        employees: DataFrame)

  /** Deterministic edge tables for q28/q29, derived from `supplier` so the
   *  DuckDB oracle rebuilds them from the same parquet: a binary
   *  subsidiary tree (k -> 2k, 2k+1 where the child key exists), an
   *  org:member_of chain (k -> k+1), and one top-employee edge per org
   *  (k -> k + 100000). Semi-joins keep only edges whose endpoint exists. */
  private def graphFixture(s: SparkSession, d: String): GraphFixture = {
    import s.implicits._
    val sup = t(s, d, "supplier").select($"s_suppkey".cast("long").as("k"))
    val keys = sup.select($"k".as("obj"))
    def exists(df: DataFrame) = df.join(keys, Seq("obj"), "left_semi")
    val subs = exists(sup.select($"k".as("subj"), ($"k" * 2).as("obj")))
      .unionByName(exists(sup.select($"k".as("subj"), ($"k" * 2 + 1).as("obj"))))
      .select($"subj", lit("org:subsidiaries").as("pred"), $"obj",
        lit(0.5).as("score"))
    val memb = exists(sup.select($"k".as("subj"), ($"k" + 1).as("obj")))
      .select($"subj", lit("org:member_of").as("pred"), $"obj",
        when($"subj" % 2 === 0, 0.5).otherwise(0.25).as("score"))
    val emp = sup.select($"k".as("subj"),
      lit("org:top_members/employees").as("pred"),
      ($"k" + 100000L).as("obj"), lit(0.25).as("score"))
    GraphFixture(subs, memb, emp)
  }

  /** Library-backed queries (each calls into a graft module rather than
   *  composing inline column expressions) plus the two KG-pipeline dumps.
   *  All but q30/q31 carry full DuckDB oracles; the pipeline dumps are
   *  rows-only here because no SQL mirror of the NLP pipeline exists —
   *  their semantics are gated by the planted-gold P/R spec and the
   *  committed golden triple-set hash (PipelineE2ESpec). */
  private def moduleQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_embed_ann_lsh" -> q((s, d) => {
      import s.implicits._
      // sign-random-projection LSH bucketing (scale path for ANN): 8 fixed
      // hyperplanes -> 8-bit bucket -> per-bucket brute force
      val e = t(s, d, "embeddings")
      // one-pass native SRP bucket (functions/VectorExpressions.scala) —
      // same fixed-hyperplane family the former 8 HOF folds computed
      val bits = graft.functions.vec.srpBucket($"embedding", 8)
      e.withColumn("bucket", bits)
        .groupBy($"bucket").agg(count(lit(1)).as("n"),
          // sorted string join, not a raw ARRAY: keeps the column hashable
          // for the driver's pandas compare AND order-deterministic
          array_join(transform(sort_array(collect_list($"vec_id")),
            v => v.cast("string")), ",").as("members"))
        .orderBy($"bucket")
    }),
    "q22_simhash" -> q((s, d) => {
      import s.implicits._
      // md5-derived 64-bit simhash, emitted as unsigned 32-bit halves +
      // 16-bit LSH bands — every column integer-exact and reproducible by
      // the DuckDB oracle via hex-digit arithmetic over md5(token)
      graft.dedup.SimHash.simhashDF(t(s, d, "documents"))
        .select($"doc_id", $"sim_hi", $"sim_lo",
          $"band0", $"band1", $"band2", $"band3")
        .orderBy($"doc_id")
    }),
    "q24_embed_neardup" -> q((s, d) => {
      import s.implicits._
      // 8 bits / low threshold at sf scale so the oracle compares real
      // rows (12+ bits is the ≥10^8-vector configuration — bits scale
      // with log(n))
      graft.dedup.NearDup.embeddingCosine(s, t(s, d, "embeddings"),
        threshold = 0.3, bits = 8)
        .select($"v1", $"v2", round($"cos", 5).as("cos"))
        .orderBy($"v1", $"v2")
    }),
    "q25_ngram_jaccard" -> q((s, d) => {
      import s.implicits._
      graft.dedup.NearDup.ngramJaccard(s, t(s, d, "documents"),
        n = 3, threshold = 0.2)
        .select($"d1", $"d2", round($"jaccard", 5).as("jaccard"))
        .orderBy($"d1", $"d2")
    }),
    "q26_text_quality" -> q((s, d) => {
      import s.implicits._
      graft.text.TextStats.quality(t(s, d, "documents"))
        .select($"doc_id", $"n_tokens", $"quality_ok")
        .orderBy($"doc_id")
    }),
    "q30_kg_triples" -> q((s, _) => {
      import s.implicits._
      val (pages, _) = graft.fixtures.PageGen.corpus(120)
      graft.pipeline.KGPipeline.run(s, s.createDataset(pages)).toDF()
        .orderBy($"subj", $"pred", $"obj")
    }),
    "q31_kg_sentences" -> q((s, _) => {
      import s.implicits._
      val (pages, _) = graft.fixtures.PageGen.corpus(120)
      graft.pipeline.KGPipeline.sentences(s, s.createDataset(pages)).toDF()
        .select($"url", $"doc_id", $"sent_idx", $"text")
        .orderBy($"url", $"sent_idx")
    }),
    // q80: distributed suffix-array ranks (prefix doubling, O(log
    // maxDocLen) keyed rounds) over a 40-doc slice — the oracle IS the
    // definition: dense_rank over the suffix strings
    "q80_suffix_ranks" -> q((s, d) => {
      import s.implicits._
      graft.text.SuffixOps.suffixRanks(s,
        t(s, d, "documents").filter($"doc_id" < 40)
          .select($"doc_id", $"text"))
        .orderBy($"doc_id", $"off")
    }),
    // q81: longest duplicated spans via suffix-array adjacency + capped
    // LCP — the arbitrary-length dedup query only the SA answers
    "q81_longest_repeats" -> q((s, d) => {
      import s.implicits._
      graft.text.SuffixOps.longestRepeats(s,
        t(s, d, "documents").select($"doc_id", $"text"), k = 20)
    }),
    // q82: fixed-length exact char-span repeats (the hash-aggregate
    // fast path for a KNOWN span length; see SuffixOps scaladoc)
    "q82_char_spans" -> q((s, d) =>
      graft.text.SuffixOps.repeatedSpans(s, t(s, d, "documents"),
        minLen = 30, k = 50)),
    // q79: the KG pipeline's relational TAIL pinned by a real oracle,
    // independently of the (non-SQL-expressible) NLP front: the
    // post-linking post-symmetric fills — consistentTriples' exact
    // input — are DUMPED to a fixed parquet path mid-query, the tail
    // (X13-X18 consistency + official rename + noisy-or edge merge +
    // entity ids) recomputes from the RE-READ dump, and the DuckDB
    // oracle restates the same tail over the same dump. This shrinks
    // the pipeline's no-oracle surface to sentences/mentionFills only.
    "q79_kg_tail" -> q((s, _) => {
      import s.implicits._
      val (pages, _) = graft.fixtures.PageGen.corpus(120)
      val pipelineFills = graft.pipeline.KGPipeline.symmetricExpand(s,
        graft.pipeline.KGPipeline.linked(s,
          graft.pipeline.KGPipeline.yThenNoisyOrGate(s,
            graft.pipeline.KGPipeline.aggregateBags(s,
              graft.pipeline.KGPipeline.mentionFills(s,
                graft.pipeline.KGPipeline.sentences(s,
                  s.createDataset(pages)))))))
      // the organic corpus exercises only the dedup/merge stages, so an
      // adversarial planted set (Zz-prefixed subjects, disjoint from the
      // corpus) drives every consistency check — including the
      // SEQUENTIAL survivor semantics (a killed fill must not kill later
      // fills) of X14 and the X12 geo pass
      val fills = pipelineFills.unionByName(s.createDataset(kgTailPlants))
      fills.toDF().select($"subj", $"subj_type", $"pred", $"obj",
          $"obj_type", $"score",
          $"prov.doc_id".as("prov_doc_id"), $"prov.url".as("prov_url"),
          $"prov.sent_idx".as("prov_sent_idx"),
          $"prov.ent_b".as("prov_ent_b"), $"prov.ent_e".as("prov_ent_e"),
          $"prov.slot_b".as("prov_slot_b"),
          $"prov.slot_e".as("prov_slot_e"))
        .coalesce(1).write.mode("overwrite").parquet(KgTailDumpPath)
      graft.link.Linker.release()
      // the tail consumes the RE-READ dump, so Spark and the oracle see
      // byte-identical input even across pipeline-front nondeterminism
      val reread = s.read.parquet(KgTailDumpPath)
        .select($"subj", $"subj_type", $"pred", $"obj", $"obj_type",
          $"score",
          struct($"prov_doc_id".as("doc_id"), $"prov_url".as("url"),
            $"prov_sent_idx".as("sent_idx"), $"prov_ent_b".as("ent_b"),
            $"prov_ent_e".as("ent_e"), $"prov_slot_b".as("slot_b"),
            $"prov_slot_e".as("slot_e")).as("prov"))
        .as[graft.model.SlotFill]
      graft.pipeline.KGPipeline.consistentTriples(s, reread).toDF()
        .orderBy($"subj", $"subj_type", $"pred", $"obj")
    })
  )

  /** Fixed dump location shared by the q79 query (writer) and its oracle
   *  (DuckDB reader) — both run on the driver host. */
  private val KgTailDumpPath = "/tmp/graft_q79_tail_dump"

  /** q79's adversarial consistency fixture: one planted subject per
   *  check, each disjoint from the PageGen corpus (Zz prefix). The
   *  "Chain"/"Acronym" subjects additionally pin the SEQUENTIAL
   *  semantics of X14 and the geo pass: the .7-scored fill conflicts
   *  ONLY with an already-killed predecessor, so an oracle that tested
   *  against all higher-ranked fills (rather than surviving ones) would
   *  wrongly drop it. */
  private def kgTailPlants: Seq[graft.model.SlotFill] = {
    import graft.model.{NER, Provenance, SlotFill}
    var n = 0
    def f(subj: String, st: String, pred: String, obj: String, ot: String,
          score: Double): SlotFill = {
      n += 1
      SlotFill(subj, st, pred, obj, ot, score,
        Provenance(f"doc-plant-$n%03d", s"https://plant.example/$n",
          0, 0, 1, 2, 3))
    }
    import NER._
    Seq(
      // X13b: employee_of dies when the same obj exists under member_of
      f("Zz Memberof Proof", PERSON, "per:member_of", "Zz Acme Corp",
        ORGANIZATION, 0.9),
      f("Zz Memberof Proof", PERSON, "per:employee_of", "Zz Acme Corp",
        ORGANIZATION, 0.8),
      // X14: acronym + containment kills, then the sequential
      // distinguisher ("Zz Johnson Doe" conflicts only with the KILLED
      // "Zz Johnson", so it survives)
      f("Zz Acronym Proof", PERSON, "per:alternate_names",
        "Zz Johnson Smith", PERSON, 0.9),
      f("Zz Acronym Proof", PERSON, "per:alternate_names",
        "Zz Johnson", PERSON, 0.8),
      f("Zz Acronym Proof", PERSON, "per:alternate_names",
        "Zz Johnson Doe", PERSON, 0.7),
      f("Zz Acronym Proof", PERSON, "per:alternate_names", "ZJS",
        PERSON, 0.6),
      // X15: SINGLE-cardinality argmax
      f("Zz Single Proof", PERSON, "per:date_of_birth", "1970-01-01",
        DATE, 0.9),
      f("Zz Single Proof", PERSON, "per:date_of_birth", "1971-02-02",
        DATE, 0.8),
      // X16: same obj under implausibly-co-occurring preds
      f("Zz Clash Proof", PERSON, "per:siblings", "Zz Bob Roe",
        PERSON, 0.9),
      f("Zz Clash Proof", PERSON, "per:children", "Zz Bob Roe",
        PERSON, 0.8),
      // X18: sub-0.01 fill dies unless it is its pred's best
      f("Zz Lowscore Proof", PERSON, "per:title", "engineer", TITLE, 0.5),
      f("Zz Lowscore Proof", PERSON, "per:title", "janitor", TITLE, 0.005),
      f("Zz Lowonly Proof", PERSON, "per:title", "oddball", TITLE, 0.005),
      // X17: location-of-death requires a date_of_death
      f("Zz Deathless Proof", PERSON, "per:city_of_death", "Boston",
        CITY, 0.9),
      f("Zz Deathful Proof", PERSON, "per:city_of_death", "Boston",
        CITY, 0.9),
      f("Zz Deathful Proof", PERSON, "per:date_of_death", "1999-01-01",
        DATE, 0.8),
      // X12 geo: Boston kills region Washington; Portland conflicts only
      // with the killed region (sequential distinguisher); the country
      // stays consistent with every kept fill
      f("Zz Geo Proof", PERSON, "per:cities_of_residence", "Boston",
        CITY, 0.9),
      f("Zz Geo Proof", PERSON, "per:stateorprovinces_of_residence",
        "Washington", STATE_OR_PROVINCE, 0.8),
      f("Zz Geo Proof", PERSON, "per:cities_of_residence", "Portland",
        CITY, 0.7),
      f("Zz Geo Proof", PERSON, "per:countries_of_residence",
        "United States", COUNTRY, 0.6),
      // X12 geo: the Washington-city / Washington-region DC special case
      f("Zz Dc Proof", PERSON, "per:cities_of_residence", "Washington",
        CITY, 0.9),
      f("Zz Dc Proof", PERSON, "per:stateorprovinces_of_residence",
        "Washington", STATE_OR_PROVINCE, 0.8),
      // X12 geo canonicalizers: city abbreviation (NYC), alternate
      // country name (U.K.), country code (USA), region code (MA, WA)
      f("Zz Abbrev Proof", PERSON, "per:cities_of_residence", "NYC",
        CITY, 0.9),
      f("Zz Abbrev Proof", PERSON, "per:stateorprovinces_of_residence",
        "California", STATE_OR_PROVINCE, 0.8),
      f("Zz Altc Proof", PERSON, "per:cities_of_residence", "London",
        CITY, 0.9),
      f("Zz Altc Proof", PERSON, "per:countries_of_residence", "U.K.",
        COUNTRY, 0.8),
      f("Zz Altc2 Proof", PERSON, "per:cities_of_residence", "London",
        CITY, 0.9),
      f("Zz Altc2 Proof", PERSON, "per:countries_of_residence", "USA",
        COUNTRY, 0.8),
      f("Zz Regcode Proof", PERSON, "per:cities_of_residence", "Boston",
        CITY, 0.9),
      f("Zz Regcode Proof", PERSON, "per:stateorprovinces_of_residence",
        "MA", STATE_OR_PROVINCE, 0.8),
      f("Zz Regcode2 Proof", PERSON, "per:cities_of_residence", "Boston",
        CITY, 0.9),
      f("Zz Regcode2 Proof", PERSON, "per:stateorprovinces_of_residence",
        "WA", STATE_OR_PROVINCE, 0.8))
  }

  /** DuckDB mirrors. Every aggregate/computed column is aliased identically
   *  on both sides; money sums are integer cents; FP-accumulation results
   *  are rounded to 6 decimals. */
  /** Shared q61/q62/q64 oracle prefix: re-extracts the <a> tags from the
   *  constructed html with DuckDB's own RE2 regexps, restates the
   *  resolution rule (scheme prefix = absolute; leading / = host-join;
   *  else directory-join) and the full q44 canonicalization — ending at
   *  CTE `cn` (url → canonical url) with `keep` holding the surviving
   *  raw edges. Each consumer appends its own final CTEs/SELECT. */
  private val linkEdgeCtes: String =
    """WITH pg AS (SELECT doc_id,
         'https://www.site' || (doc_id % 7) || '.com/dir' || (doc_id % 3)
           || '/page-' || doc_id AS src,
         '<html><head><title>t</title></head><body><p>x</p><nav>'
           || '<a href="/page-' || (doc_id % 50) || '">Hub '
           || (doc_id % 50) || '</a>'
           || '<a href="https://Other.org:443/a-' || (doc_id % 11)
           || '?utm_source=z&x=1">'
           || CASE WHEN doc_id % 3 = 0 THEN 'E' || (doc_id % 11)
                   ELSE 'Entity ' || (doc_id % 11) END || '</a>'
           || CASE WHEN doc_id % 5 = 0
                   THEN '<a href="mailto:a@b.c">mail</a>' ELSE '' END
           || CASE WHEN doc_id % 4 = 0
                   THEN '<a href="rel.html">more</a>' ELSE '' END
           || '</nav></body></html>' AS html FROM documents),
       tg AS (SELECT doc_id, src,
           unnest(list_zip(
             regexp_extract_all(html, '(?i)<a\s[^>]*>[^<]*</a>'),
             range(len(regexp_extract_all(html,
               '(?i)<a\s[^>]*>[^<]*</a>'))))) AS z
         FROM pg),
       ex AS (SELECT doc_id, src, CAST(z[2] AS INTEGER) AS pos,
           regexp_extract(z[1], '(?i)href="([^"]*)"', 1) AS href,
           trim(regexp_extract(z[1], '>([^<]*)<', 1)) AS anchor
         FROM tg),
       rs AS (SELECT doc_id, src, pos, href, anchor,
           CASE WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.-]*:')
                  THEN href
                WHEN href LIKE '/%' THEN regexp_extract(src,
                  '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) || href
                ELSE regexp_extract(src,
                  '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) ||
                  CASE WHEN regexp_replace(regexp_extract(src,
                         '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                         '[^/]*$', '') = '' THEN '/'
                       ELSE regexp_replace(regexp_extract(src,
                         '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1),
                         '[^/]*$', '') END || href END AS resolved
         FROM ex WHERE href <> ''),
       keep AS (SELECT * FROM rs
         WHERE regexp_matches(resolved, '^(?i)https?://')),
       urls AS (SELECT src AS u FROM pg
                UNION SELECT resolved FROM keep),
       c0 AS (SELECT u, regexp_replace(trim(u), '#.*', '') AS t FROM urls),
       c1 AS (SELECT u,
           lower(regexp_extract(t,
             '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
           lower(regexp_extract(t,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS auth,
           regexp_extract(t,
             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$', 1) AS rest
         FROM c0),
       c2 AS (SELECT u, scheme,
           CASE WHEN scheme = 'https' THEN regexp_replace(
                  regexp_replace(auth, '^www\.', ''), ':443$', '')
                WHEN scheme = 'http' THEN regexp_replace(
                  regexp_replace(auth, '^www\.', ''), ':80$', '')
                ELSE regexp_replace(auth, '^www\.', '') END AS host,
           CASE WHEN regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
                       '/+$', '') = '' THEN '/'
                ELSE regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
                       '/+$', '') END AS path,
           coalesce(array_to_string(list_filter(
             string_split(regexp_extract(rest, '^[^?]*\?(.*)$', 1), '&'),
             x -> NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)=')
                  AND x <> ''), '&'), '') AS query
         FROM c1),
       cn AS (SELECT u, scheme || '://' || host || path ||
           CASE WHEN query = '' THEN '' ELSE '?' || query END AS cu
         FROM c2)"""

  def oracleSql: Map[String, String] = Map(
    "q01_pricing" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS base_cents,
         CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS disc_cents,
         count(*) AS n
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "q02_noisyor" ->
      """SELECT l_orderkey,
         CAST(product(100 - round(l_discount*100)) AS BIGINT) AS inv_prod,
         count(*) AS n FROM (
           SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY
             l_linenumber, l_partkey, l_suppkey,
             round(l_extendedprice*100), round(l_discount*100)) AS rk
           FROM lineitem) WHERE rk <= 4
         GROUP BY 1 ORDER BY 1""",
    "q03_argmax" ->
      """SELECT l_orderkey, l_partkey, l_linenumber,
         CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents FROM (
           SELECT *, row_number() OVER (PARTITION BY l_orderkey
             ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
           FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""",
    "q04_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(rn AS INTEGER) AS rn FROM (
           SELECT o_custkey, o_orderkey, row_number() OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q05_star_join" ->
      """SELECT r_name, count(*) AS n, sum(l_quantity) AS sum_qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "q06_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q07_semi_join" ->
      """SELECT p_brand, count(*) AS n FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         GROUP BY 1 ORDER BY 1""",
    "q08_setops" ->
      """SELECT DISTINCT c_nationkey AS nk FROM customer
         EXCEPT SELECT DISTINCT s_nationkey AS nk FROM supplier
         ORDER BY nk""",
    "q09_dedup" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
         ORDER BY 1, 2""",
    "q10_strings" ->
      """SELECT p_partkey, CAST(levenshtein(p_name, p_type) AS INTEGER) AS lev,
         md5(p_name) AS h, upper(p_brand) AS b,
         CAST(length(p_name) AS INTEGER) AS len
         FROM part ORDER BY p_partkey""",
    "q11_running" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_cents
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q12_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
         CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q13_docs_tokens" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_tokens,
         n_chars FROM documents ORDER BY doc_id""",
    "q34_docs_subwords" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Z]?[a-z]+|[A-Z]+|\d+|[^\sA-Za-z0-9]')) AS INTEGER) AS n_subwords
         FROM documents ORDER BY doc_id""",
    "q14_docs_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
         FROM documents ORDER BY doc_id""",
    "q15_docs_dedup_exact" ->
      """SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keep_id
         FROM documents GROUP BY 1 ORDER BY 1""",
    "q16_docs_quality" ->
      """SELECT doc_id,
         CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS INTEGER) AS alpha,
         CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS INTEGER) AS spaces,
         length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) / CAST(n_chars AS DOUBLE) AS alpha_ratio
         FROM documents ORDER BY doc_id""",
    "q17_docs_langid" ->
      """SELECT doc_id,
         CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
              WHEN (' '||lower(text)||' ') LIKE '% der %' OR (' '||lower(text)||' ') LIKE '% und %' OR (' '||lower(text)||' ') LIKE '% die %' THEN 'de'
              WHEN (' '||lower(text)||' ') LIKE '% le %' OR (' '||lower(text)||' ') LIKE '% la %' OR (' '||lower(text)||' ') LIKE '% et %' THEN 'fr'
              WHEN (' '||lower(text)||' ') LIKE '% el %' OR (' '||lower(text)||' ') LIKE '% los %' OR (' '||lower(text)||' ') LIKE '% y %' THEN 'es'
              WHEN (' '||lower(text)||' ') LIKE '% the %' OR (' '||lower(text)||' ') LIKE '% and %' OR (' '||lower(text)||' ') LIKE '% a %' THEN 'en'
              ELSE 'und' END AS pred_lang,
         lang FROM documents ORDER BY doc_id""",
    "q18_docs_jaccard" ->
      """WITH w0 AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         rare AS (SELECT word FROM (SELECT word, count(*) AS df FROM w0 GROUP BY 1) WHERE df <= 100),
         w AS (SELECT w0.doc_id, w0.word FROM w0 JOIN rare USING (word)),
         sz AS (SELECT doc_id, count(*) AS n FROM w GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
                   FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT d1, d2, CAST(i AS BIGINT) AS i
         FROM inter JOIN sz sa ON d1 = sa.doc_id JOIN sz sb ON d2 = sb.doc_id
         WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.9
         ORDER BY d1, d2""",
    "q19_docs_minhash_lsh" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         hm AS (SELECT doc_id, md5('0'||word) AS m0, md5('1'||word) AS m1,
                       md5('2'||word) AS m2, md5('3'||word) AS m3 FROM w),
         m AS (SELECT doc_id,
           min(substr(m0, 1, 16)) AS h0, min(substr(m0, 17, 16)) AS h1,
           min(substr(m1, 1, 16)) AS h2, min(substr(m1, 17, 16)) AS h3,
           min(substr(m2, 1, 16)) AS h4, min(substr(m2, 17, 16)) AS h5,
           min(substr(m3, 1, 16)) AS h6, min(substr(m3, 17, 16)) AS h7
           FROM hm GROUP BY 1),
         b AS (SELECT doc_id, md5(h0||h1||h2||h3) AS b1, md5(h4||h5||h6||h7) AS b2 FROM m),
         r1 AS (SELECT b1 AS bucket, min(doc_id) AS d1 FROM b GROUP BY 1),
         r2 AS (SELECT b2 AS bucket, min(doc_id) AS d1 FROM b GROUP BY 1),
         e AS (SELECT r1.d1, b.doc_id AS d2 FROM b JOIN r1 ON b.b1 = r1.bucket WHERE b.doc_id > r1.d1
               UNION
               SELECT r2.d1, b.doc_id AS d2 FROM b JOIN r2 ON b.b2 = r2.bucket WHERE b.doc_id > r2.d1)
         SELECT DISTINCT d1, d2 FROM e ORDER BY d1, d2""",
    // q78: q19's star-edge candidates, each verified with exact 3-gram
    // Jaccard over the per-doc DISTINCT shingle sets (no df cap — the
    // verification is per candidate pair, so no quadratic guard needed)
    "q78_jaccard_star" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         hm AS (SELECT doc_id, md5('0'||word) AS m0, md5('1'||word) AS m1,
                       md5('2'||word) AS m2, md5('3'||word) AS m3 FROM w),
         m AS (SELECT doc_id,
           min(substr(m0, 1, 16)) AS h0, min(substr(m0, 17, 16)) AS h1,
           min(substr(m1, 1, 16)) AS h2, min(substr(m1, 17, 16)) AS h3,
           min(substr(m2, 1, 16)) AS h4, min(substr(m2, 17, 16)) AS h5,
           min(substr(m3, 1, 16)) AS h6, min(substr(m3, 17, 16)) AS h7
           FROM hm GROUP BY 1),
         b AS (SELECT doc_id, md5(h0||h1||h2||h3) AS b1, md5(h4||h5||h6||h7) AS b2 FROM m),
         r1 AS (SELECT b1 AS bucket, min(doc_id) AS d1 FROM b GROUP BY 1),
         r2 AS (SELECT b2 AS bucket, min(doc_id) AS d1 FROM b GROUP BY 1),
         e AS (SELECT r1.d1, b.doc_id AS d2 FROM b JOIN r1 ON b.b1 = r1.bucket WHERE b.doc_id > r1.d1
               UNION
               SELECT r2.d1, b.doc_id AS d2 FROM b JOIN r2 ON b.b2 = r2.bucket WHERE b.doc_id > r2.d1),
         cand AS (SELECT DISTINCT d1, d2 FROM e),
         ws AS (SELECT doc_id, string_split(text, ' ') AS wl FROM documents),
         sh0 AS (SELECT doc_id,
                   unnest(list_transform(range(greatest(len(wl) - 3, 0) + 1),
                     i -> array_to_string(wl[i + 1 : i + 3], ' '))) AS shingle
                 FROM ws),
         sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
         sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
         inter AS (SELECT c.d1, c.d2, count(*) AS i
                   FROM cand c JOIN sh a ON a.doc_id = c.d1
                               JOIN sh bb ON bb.doc_id = c.d2
                                AND bb.shingle = a.shingle
                   GROUP BY 1, 2),
         j AS (SELECT c.d1, c.d2,
                 CAST(coalesce(i.i, 0) AS DOUBLE)
                   / (sa.sz + sb.sz - coalesce(i.i, 0)) AS jacc
               FROM cand c
               LEFT JOIN inter i ON c.d1 = i.d1 AND c.d2 = i.d2
               JOIN sz sa ON c.d1 = sa.doc_id
               JOIN sz sb ON c.d2 = sb.doc_id)
         SELECT d1, d2, round(jacc, 5) AS jaccard FROM j
         WHERE jacc >= 0.2 ORDER BY d1, d2""",
    // q38: q19's star edges, closed into components by a recursive CTE
    // (UNION dedups, so the closure terminates at the reachable-pair
    // fixpoint), cluster label = min reachable doc_id (identical to
    // Spark's min-label propagation fixpoint), election by
    // (n_tokens DESC, doc_id ASC) via row_number
    "q38_docs_dedup_cluster" ->
      """WITH RECURSIVE
         w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         hm AS (SELECT doc_id, md5('0'||word) AS m0, md5('1'||word) AS m1,
                       md5('2'||word) AS m2, md5('3'||word) AS m3 FROM w),
         m AS (SELECT doc_id,
           min(substr(m0, 1, 16)) AS h0, min(substr(m0, 17, 16)) AS h1,
           min(substr(m1, 1, 16)) AS h2, min(substr(m1, 17, 16)) AS h3,
           min(substr(m2, 1, 16)) AS h4, min(substr(m2, 17, 16)) AS h5,
           min(substr(m3, 1, 16)) AS h6, min(substr(m3, 17, 16)) AS h7
           FROM hm GROUP BY 1),
         b AS (SELECT doc_id, md5(h0||h1||h2||h3) AS b1, md5(h4||h5||h6||h7) AS b2 FROM m),
         r1 AS (SELECT b1 AS bucket, min(doc_id) AS d1 FROM b GROUP BY 1),
         r2 AS (SELECT b2 AS bucket, min(doc_id) AS d1 FROM b GROUP BY 1),
         e AS (SELECT r1.d1, b.doc_id AS d2 FROM b JOIN r1 ON b.b1 = r1.bucket WHERE b.doc_id > r1.d1
               UNION
               SELECT r2.d1, b.doc_id AS d2 FROM b JOIN r2 ON b.b2 = r2.bucket WHERE b.doc_id > r2.d1),
         und AS (SELECT d1 AS a, d2 AS bb FROM e UNION SELECT d2, d1 FROM e),
         reach(a, bb) AS (SELECT a, bb FROM und
                          UNION
                          SELECT r.a, u.bb FROM reach r JOIN und u ON r.bb = u.a),
         comp AS (SELECT a AS doc_id, least(a, min(bb)) AS cluster FROM reach GROUP BY a),
         toks AS (SELECT doc_id,
                    CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_tokens
                  FROM documents),
         lab AS (SELECT t.doc_id, coalesce(c.cluster, t.doc_id) AS cluster, t.n_tokens
                 FROM toks t LEFT JOIN comp c USING (doc_id)),
         canon AS (SELECT cluster, doc_id AS canon_doc FROM (
                     SELECT cluster, doc_id,
                       row_number() OVER (PARTITION BY cluster
                         ORDER BY n_tokens DESC, doc_id ASC) AS rn
                     FROM lab) WHERE rn = 1)
         SELECT lab.doc_id, lab.cluster, lab.n_tokens,
           (lab.doc_id = canon.canon_doc) AS keep
         FROM lab JOIN canon USING (cluster) ORDER BY lab.doc_id""",
    // q39: the salt only routes rows to stage-1 subgroups (the two-phase
    // top-k is exact), so the oracle needs no salt — one row_number per
    // stratum reproduces the result
    "q39_docs_sample_stratified" ->
      """SELECT doc_id, lang FROM (
           SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents) WHERE rn <= 20 ORDER BY doc_id""",
    // q40: the oracle's single global window IS the semantics; the Spark
    // side computes the same exclusive prefix sum distributed (per-block
    // windows + cumulative block offsets)
    "q40_docs_pack_shards" ->
      """WITH t AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
           FROM documents),
         p AS (SELECT doc_id, n_tokens,
             coalesce(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre
           FROM t)
         SELECT doc_id, n_tokens, CAST(pre // 2000 AS BIGINT) AS shard
         FROM p ORDER BY doc_id""",
    // q41: same integer-exact ranking; the float tfidf column rides along
    // (compared within the harness's 1e-9 tolerance)
    "q41_docs_salient_terms" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n FROM documents),
         r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                 tf.tf * ln((n.n + 1.0) / (df.df + 1.0)) AS tfidf,
                 row_number() OVER (PARTITION BY tf.doc_id
                   ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS term_rank
               FROM tf JOIN df USING (term) CROSS JOIN n)
         SELECT doc_id, term, tf, df, tfidf, term_rank
         FROM r WHERE term_rank <= 3 ORDER BY doc_id, term_rank""",
    // q42: every fraction is one IEEE division of two integer counts —
    // both engines produce the identical double, so even the threshold
    // booleans agree at boundaries
    "q42_docs_repetition" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         u AS (SELECT doc_id, unnest(ws) AS word FROM w),
         uc AS (SELECT doc_id, word, count(*) AS c FROM u GROUP BY 1, 2),
         us AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                  count(*) AS n_distinct, max(c) AS top_word_cnt
                FROM uc GROUP BY 1),
         b AS (SELECT doc_id, unnest(list_transform(range(1, len(ws)),
                 i -> ws[i] || ' ' || ws[i+1])) AS bg FROM w),
         bc AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY 1, 2),
         bs AS (SELECT doc_id, max(c) AS top_bigram_cnt FROM bc GROUP BY 1)
         SELECT us.doc_id, n_tokens, n_distinct, top_word_cnt,
           bs.top_bigram_cnt,
           CAST(n_tokens - n_distinct AS DOUBLE) / n_tokens AS dup_word_frac,
           CAST(top_word_cnt AS DOUBLE) / n_tokens AS top_word_frac,
           CASE WHEN n_tokens >= 2
                THEN CAST(bs.top_bigram_cnt AS DOUBLE) / (n_tokens - 1) END
             AS top_bigram_frac,
           (CAST(top_word_cnt AS DOUBLE) / n_tokens) <= 0.3 AND coalesce(
             CAST(bs.top_bigram_cnt AS DOUBLE) / (n_tokens - 1) <= 0.2, TRUE)
             AS repetition_ok
         FROM us LEFT JOIN bs ON us.doc_id = bs.doc_id
         ORDER BY us.doc_id""",
    // q43: docs with doc_id % 97 == 0 are the stand-in benchmark corpus;
    // the oracle recomputes the distinct-shingle probe with plain joins
    "q43_docs_contamination" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
         s0 AS (SELECT doc_id, unnest(list_transform(range(1, len(ws) - 1),
                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS sh
                FROM w),
         s AS (SELECT DISTINCT doc_id, sh FROM s0),
         bset AS (SELECT DISTINCT sh FROM s WHERE doc_id % 97 = 0),
         tot AS (SELECT doc_id, count(*) AS n_shingles FROM s GROUP BY 1),
         hit AS (SELECT s.doc_id, count(*) AS n_hit
                 FROM s JOIN bset USING (sh) GROUP BY 1)
         SELECT d.doc_id,
           coalesce(tot.n_shingles, 0) AS n_shingles,
           coalesce(hit.n_hit, 0) AS n_hit,
           CASE WHEN coalesce(tot.n_shingles, 0) > 0
                THEN CAST(coalesce(hit.n_hit, 0) AS DOUBLE) / tot.n_shingles
           END AS contaminated_frac,
           coalesce(hit.n_hit, 0) > 0 AS contaminated
         FROM documents d
         LEFT JOIN tot ON d.doc_id = tot.doc_id
         LEFT JOIN hit ON d.doc_id = hit.doc_id
         ORDER BY d.doc_id""",
    // q44: the oracle restates the canonicalization semantics (lowercase
    // scheme+host, www/default-port strip, fragment drop, tracking-param
    // filter, trailing-slash collapse) independently, then keeps the
    // newest capture per canonical URL via a window
    "q44_url_latest_crawl" ->
      """WITH p AS (SELECT doc_id,
           'HTTPS://WWW.Site' || (doc_id % 7) || '.COM:443/Page' ||
             (doc_id % 13) ||
             CASE WHEN doc_id % 3 = 0
                  THEN '/?utm_source=x&ref=' || (doc_id % 5) ELSE '' END
             AS url,
           doc_id AS ts FROM documents),
         c AS (SELECT doc_id, ts,
           lower(regexp_extract(url,
             '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
           lower(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS auth,
           regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$', 1) AS rest
           FROM p),
         h AS (SELECT doc_id, ts, scheme,
           CASE WHEN scheme = 'https' THEN
                  regexp_replace(regexp_replace(auth, '^www\.', ''), ':443$', '')
                WHEN scheme = 'http' THEN
                  regexp_replace(regexp_replace(auth, '^www\.', ''), ':80$', '')
                ELSE regexp_replace(auth, '^www\.', '') END AS host,
           CASE WHEN regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
                       '/+$', '') = '' THEN '/'
                ELSE regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
                       '/+$', '') END AS path,
           coalesce(array_to_string(list_filter(
             string_split(regexp_extract(rest, '^[^?]*\?(.*)$', 1), '&'),
             x -> NOT regexp_matches(x, '^(utm_[^=]*|fbclid|gclid)=')
                  AND x <> ''), '&'), '') AS query
           FROM c),
         u AS (SELECT doc_id, ts, scheme || '://' || host || path ||
             CASE WHEN query = '' THEN '' ELSE '?' || query END
             AS canonical_url FROM h),
         r AS (SELECT canonical_url, doc_id,
             count(*) OVER (PARTITION BY canonical_url) AS n_crawls,
             row_number() OVER (PARTITION BY canonical_url
               ORDER BY ts DESC) AS rn FROM u)
         SELECT canonical_url, doc_id AS kept_doc_id, n_crawls
         FROM r WHERE rn = 1 ORDER BY canonical_url""",
    // PII: counts over the original text, sequential email->phone->ip
    // global replace (RE2 states the same Java-regex-compatible patterns)
    "q45_pii_redact" ->
      """WITH p AS (SELECT doc_id, text ||
           CASE WHEN doc_id % 2 = 0 THEN ' contact user' || (doc_id % 7) ||
                '@mail' || (doc_id % 3) || '.com' ELSE '' END ||
           CASE WHEN doc_id % 3 = 0 THEN ' call 800-555-' ||
                lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
           CASE WHEN doc_id % 5 = 0 THEN ' from 10.' || (doc_id % 256) ||
                '.0.' || (doc_id % 200) ELSE '' END AS text
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text,
             '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(text,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT)
             AS n_ipv4,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(text,
             '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}'))
             + len(regexp_extract_all(text,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT)
             AS n_pii,
           (len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             + len(regexp_extract_all(text,
             '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}'))
             + len(regexp_extract_all(text,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))) > 0
             AS has_pii,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')
             AS redacted_text
         FROM p ORDER BY doc_id""",
    // domain rollup: same host/domain regexes restated; tokens = \S+ runs
    "q46_domain_stats" ->
      """WITH p AS (SELECT
           'https://www.' || CASE WHEN doc_id % 11 = 0 THEN 'cdn.' ELSE '' END
             || 'site' || (doc_id % 7) || '.com/page' || (doc_id % 13) AS url,
           text FROM documents),
         h AS (SELECT
           regexp_replace(regexp_replace(
             lower(regexp_extract(trim(url),
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)),
             ':[0-9]+$', ''), '^www\.', '') AS host,
           CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS toks
           FROM p),
         d AS (SELECT regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
                      host, count(*) AS n, sum(toks) AS t
               FROM h GROUP BY 1, 2)
         SELECT domain, CAST(sum(n) AS BIGINT) AS n_pages,
           count(*) AS n_hosts, CAST(sum(t) AS BIGINT) AS total_tokens,
           domain IN ('site2.com', 'site5.com') AS blocked
         FROM d GROUP BY domain ORDER BY domain""",
    // line-level boilerplate: df over distinct docs per line; kept lines
    // reassembled in original order (string_agg ORDER BY pos)
    "q47_line_dedup" ->
      """WITH p AS (SELECT doc_id,
           'COOKIE BANNER accept all cookies' || chr(10) ||
           'nav home products about ' || (doc_id % 4) || chr(10) ||
           substr(text, 1, 40) || chr(10) ||
           'doc ' || doc_id || ' body line' || chr(10) ||
           'copyright site' || (doc_id % 7) AS text
           FROM documents),
         l AS (SELECT doc_id, u.line, u.pos FROM p,
               LATERAL (SELECT unnest(string_split(p.text, chr(10))) AS line,
                        generate_subscripts(string_split(p.text, chr(10)), 1)
                          AS pos) u),
         f AS (SELECT line FROM
                 (SELECT line, count(DISTINCT doc_id) AS c FROM l GROUP BY 1)
               WHERE c >= 50),
         t AS (SELECT l.doc_id, l.line, l.pos,
                      f.line IS NOT NULL AS boiler
               FROM l LEFT JOIN f ON l.line = f.line)
         SELECT doc_id, count(*) AS n_lines,
           CAST(coalesce(count(*) FILTER (NOT boiler), 0) AS BIGINT)
             AS n_kept,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
             FILTER (NOT boiler), '') AS cleaned_text
         FROM t GROUP BY doc_id ORDER BY doc_id""",
    // triangles: naive a<b<c 3-way self-join recount of the degree-oriented
    // Spark enumeration (same canonical edge set, same per-node credit)
    "q48_graph_triangles" ->
      """WITH ids AS (SELECT doc_id AS i FROM documents),
         e0 AS (SELECT i AS src, i + 1 AS dst FROM ids
                UNION ALL SELECT i, i + 2 FROM ids
                UNION ALL SELECT i, (i * 17 + 5) % 101 FROM ids),
         e AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
               FROM e0 WHERE src <> dst),
         deg AS (SELECT v, count(*) AS degree FROM
                   (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
                 GROUP BY 1),
         tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                 FROM e e1 JOIN e e2 ON e2.a = e1.b
                           JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         pn AS (SELECT v, count(*) AS t FROM
                  (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
                   UNION ALL SELECT z FROM tri)
                GROUP BY 1)
         SELECT d.v AS node, d.degree,
           CAST(coalesce(pn.t, 0) AS BIGINT) AS triangles
         FROM deg d LEFT JOIN pn ON pn.v = d.v ORDER BY node""",
    // PageRank: the integer recurrence restated as chained CTEs — BIGINT
    // floor division (//) matches Spark's div on nonnegative operands
    "q49_pagerank" ->
      """WITH ids AS (SELECT doc_id AS i FROM documents),
         e0 AS (SELECT i AS src, i + 1 AS dst FROM ids
                UNION ALL SELECT i, i + 2 FROM ids
                UNION ALL SELECT i, (i * 17 + 5) % 101 FROM ids),
         e AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
         v AS (SELECT DISTINCT v FROM
                 (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
         od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         r0 AS (SELECT v, CAST(1000000000000 AS BIGINT) AS rank FROM v),
         c1 AS (SELECT e.dst AS v,
                       sum((r0.rank * 85) // (od.outdeg * 100)) AS m
                FROM e JOIN r0 ON r0.v = e.src JOIN od ON od.src = e.src
                GROUP BY 1),
         r1 AS (SELECT v.v, 150000000000 + coalesce(c1.m, 0) AS rank
                FROM v LEFT JOIN c1 ON c1.v = v.v),
         c2 AS (SELECT e.dst AS v,
                       sum((r1.rank * 85) // (od.outdeg * 100)) AS m
                FROM e JOIN r1 ON r1.v = e.src JOIN od ON od.src = e.src
                GROUP BY 1),
         r2 AS (SELECT v.v, 150000000000 + coalesce(c2.m, 0) AS rank
                FROM v LEFT JOIN c2 ON c2.v = v.v),
         c3 AS (SELECT e.dst AS v,
                       sum((r2.rank * 85) // (od.outdeg * 100)) AS m
                FROM e JOIN r2 ON r2.v = e.src JOIN od ON od.src = e.src
                GROUP BY 1),
         r3 AS (SELECT v.v, 150000000000 + coalesce(c3.m, 0) AS rank
                FROM v LEFT JOIN c3 ON c3.v = v.v)
         SELECT v AS node, CAST(rank AS BIGINT) AS rank FROM r3
         ORDER BY node""",
    // duplicated spans: same md5'd full-window word 8-grams; a gram seen
    // >= 2 times anywhere (cross-doc or self-repeat) is duplicated
    "q50_dup_spans" ->
      """WITH p AS (SELECT doc_id, text ||
           CASE WHEN doc_id % 3 = 0 THEN
             ' all rights reserved terms of service apply contact us today'
           ELSE '' END AS text FROM documents),
         tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM p),
         g AS (SELECT doc_id, md5(array_to_string(t[i:i+7], ' ')) AS h
               FROM tok, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i) u
               WHERE len(t) >= 8),
         c AS (SELECT h FROM
                 (SELECT h, count(*) AS c FROM g GROUP BY 1) WHERE c >= 2),
         pd AS (SELECT g.doc_id, count(*) AS n_grams, count(c.h) AS n_dup
                FROM g LEFT JOIN c ON g.h = c.h GROUP BY 1)
         SELECT d.doc_id,
           CAST(coalesce(pd.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(coalesce(pd.n_dup, 0) AS BIGINT) AS n_dup,
           CASE WHEN coalesce(pd.n_grams, 0) > 0
                THEN CAST(pd.n_dup AS DOUBLE) / pd.n_grams END
             AS dup_fraction,
           coalesce(CAST(pd.n_dup AS DOUBLE) / pd.n_grams >= 0.5, false)
             AS flagged
         FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
         ORDER BY d.doc_id""",
    // vocabulary: same (cnt DESC, word ASC) total order; coverage =
    // exact running BIGINT sum / exact total, one double division
    "q51_vocab" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                    FROM documents),
         c AS (SELECT word, count(*) AS cnt FROM w WHERE word <> ''
               GROUP BY 1),
         tot AS (SELECT sum(cnt) AS t FROM c),
         tk AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT 100)
         SELECT row_number() OVER (ORDER BY cnt DESC, word) AS rank,
           word, CAST(cnt AS BIGINT) AS cnt,
           CAST(sum(cnt) OVER (ORDER BY cnt DESC, word
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / (SELECT CAST(t AS DOUBLE) FROM tot) AS coverage
         FROM tk ORDER BY rank""",
    // sessions: identical lag/running-sum recurrence; DuckDB epoch_us()
    // and Spark unix_micros are both the timestamp's exact integer
    // microsecond representation — the gap compare and the duration
    // floor-division are stated in BIGINT micros on both engines
    "q52_sessions" ->
      """WITH x AS (SELECT user_id, event_id, ts,
           CASE WHEN lag(ts) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1
                WHEN epoch_us(ts) - epoch_us(lag(ts) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
                THEN 1 ELSE 0 END AS brk
           FROM events),
         s AS (SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
               FROM x)
         SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_sec
         FROM s GROUP BY 1, 2 ORDER BY user_id, session_id""",
    // conjunctive search: same two-level integer rollup; HAVING = the
    // all-terms gate
    "q53_search" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                    FROM documents),
         tf AS (SELECT doc_id, word, count(*) AS tf FROM w
                WHERE word IN ('vector', 'join', 'window')
                GROUP BY 1, 2)
         SELECT doc_id, count(*) AS n_terms,
           CAST(sum(tf) AS BIGINT) AS total_tf,
           min(tf) AS min_tf
         FROM tf GROUP BY doc_id HAVING count(*) = 3
         ORDER BY doc_id""",
    "q54_kmv_distinct" -> kmvOracleSql(k = 16),
    // co-occurrence: DuckDB restates the same slice+zip pair generation
    // over the empty-filtered token list (list_zip of offset slices —
    // the lateral-position form isn't supported), canonical
    // least/greatest pair order, integer counts
    "q55_cooccurrence" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '),
                                       x -> x <> '') AS ws
                    FROM documents),
         pr AS (
           SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS p
           FROM t WHERE len(ws) >= 2
           UNION ALL
           SELECT unnest(list_zip(ws[1:len(ws)-2], ws[3:len(ws)])) AS p
           FROM t WHERE len(ws) >= 3)
         SELECT least(p[1], p[2]) AS w1, greatest(p[1], p[2]) AS w2,
           count(*) AS n_pairs
         FROM pr GROUP BY 1, 2 HAVING count(*) >= 2
         ORDER BY w1, w2""",
    // q56: q19's star-edge CTE, then DuckDB's own levenshtein over the
    // same 256-char prefixes; the verdict stays an integer compare
    "q56_verify_pairs" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         hm AS (SELECT doc_id, md5('0'||word) AS m0, md5('1'||word) AS m1,
                       md5('2'||word) AS m2, md5('3'||word) AS m3 FROM w),
         m AS (SELECT doc_id,
           min(substr(m0, 1, 16)) AS h0, min(substr(m0, 17, 16)) AS h1,
           min(substr(m1, 1, 16)) AS h2, min(substr(m1, 17, 16)) AS h3,
           min(substr(m2, 1, 16)) AS h4, min(substr(m2, 17, 16)) AS h5,
           min(substr(m3, 1, 16)) AS h6, min(substr(m3, 17, 16)) AS h7
           FROM hm GROUP BY 1),
         b AS (SELECT doc_id, md5(h0||h1||h2||h3) AS b1, md5(h4||h5||h6||h7) AS b2 FROM m),
         r1 AS (SELECT b1 AS bucket, min(doc_id) AS d1 FROM b GROUP BY 1),
         r2 AS (SELECT b2 AS bucket, min(doc_id) AS d1 FROM b GROUP BY 1),
         e AS (SELECT r1.d1, b.doc_id AS d2 FROM b JOIN r1 ON b.b1 = r1.bucket WHERE b.doc_id > r1.d1
               UNION
               SELECT r2.d1, b.doc_id AS d2 FROM b JOIN r2 ON b.b2 = r2.bucket WHERE b.doc_id > r2.d1),
         px AS (SELECT doc_id, substr(text, 1, 256) AS pfx FROM documents)
         SELECT e.d1, e.d2,
           CAST(levenshtein(p1.pfx, p2.pfx) AS BIGINT) AS dist,
           CAST(greatest(len(p1.pfx), len(p2.pfx)) AS BIGINT) AS max_len,
           levenshtein(p1.pfx, p2.pfx) * 10 <= greatest(len(p1.pfx), len(p2.pfx))
             AS is_dup
         FROM e JOIN px p1 ON p1.doc_id = e.d1
                JOIN px p2 ON p2.doc_id = e.d2
         ORDER BY e.d1, e.d2""",
    // q58: the peeling recurrence as chained CTEs (same device as q49's
    // pagerank): keep_i = deg(e_{i-1}) >= k, e_i = e_{i-1} ∩ keep_i²
    "q58_kcore" ->
      """WITH ids AS (SELECT doc_id AS i FROM documents),
         raw AS (SELECT i AS s, i + 1 AS d FROM ids
                 UNION ALL SELECT i, i + 2 FROM ids
                 UNION ALL SELECT i, (i * 17 + 5) % 101 FROM ids),
         e0 AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
                FROM raw WHERE s <> d),
         d0 AS (SELECT v, count(*) AS deg FROM
                  (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0)
                GROUP BY 1),
         k1 AS (SELECT v FROM d0 WHERE deg >= 4),
         e1 AS (SELECT a, b FROM e0 WHERE a IN (SELECT v FROM k1)
                  AND b IN (SELECT v FROM k1)),
         d1 AS (SELECT v, count(*) AS deg FROM
                  (SELECT a AS v FROM e1 UNION ALL SELECT b FROM e1)
                GROUP BY 1),
         k2 AS (SELECT v FROM d1 WHERE deg >= 4),
         e2 AS (SELECT a, b FROM e1 WHERE a IN (SELECT v FROM k2)
                  AND b IN (SELECT v FROM k2)),
         d2 AS (SELECT v, count(*) AS deg FROM
                  (SELECT a AS v FROM e2 UNION ALL SELECT b FROM e2)
                GROUP BY 1),
         k3 AS (SELECT v FROM d2 WHERE deg >= 4),
         e3 AS (SELECT a, b FROM e2 WHERE a IN (SELECT v FROM k3)
                  AND b IN (SELECT v FROM k3)),
         df AS (SELECT v, count(*) AS deg FROM
                  (SELECT a AS v FROM e3 UNION ALL SELECT b FROM e3)
                GROUP BY 1)
         SELECT d0.v AS node, d0.deg AS deg0,
           coalesce(df.deg, 0) AS deg_final,
           d0.v IN (SELECT v FROM k3) AS in_core
         FROM d0 LEFT JOIN df ON df.v = d0.v
         ORDER BY node""",
    // q59: q38's recursive closure, rolled up into the size histogram
    "q59_cluster_sizes" ->
      """WITH RECURSIVE
         w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
         hm AS (SELECT doc_id, md5('0'||word) AS m0, md5('1'||word) AS m1,
                       md5('2'||word) AS m2, md5('3'||word) AS m3 FROM w),
         m AS (SELECT doc_id,
           min(substr(m0, 1, 16)) AS h0, min(substr(m0, 17, 16)) AS h1,
           min(substr(m1, 1, 16)) AS h2, min(substr(m1, 17, 16)) AS h3,
           min(substr(m2, 1, 16)) AS h4, min(substr(m2, 17, 16)) AS h5,
           min(substr(m3, 1, 16)) AS h6, min(substr(m3, 17, 16)) AS h7
           FROM hm GROUP BY 1),
         b AS (SELECT doc_id, md5(h0||h1||h2||h3) AS b1, md5(h4||h5||h6||h7) AS b2 FROM m),
         r1 AS (SELECT b1 AS bucket, min(doc_id) AS d1 FROM b GROUP BY 1),
         r2 AS (SELECT b2 AS bucket, min(doc_id) AS d1 FROM b GROUP BY 1),
         e AS (SELECT r1.d1, b.doc_id AS d2 FROM b JOIN r1 ON b.b1 = r1.bucket WHERE b.doc_id > r1.d1
               UNION
               SELECT r2.d1, b.doc_id AS d2 FROM b JOIN r2 ON b.b2 = r2.bucket WHERE b.doc_id > r2.d1),
         und AS (SELECT d1 AS a, d2 AS bb FROM e UNION SELECT d2, d1 FROM e),
         reach(a, bb) AS (SELECT a, bb FROM und
                          UNION
                          SELECT r.a, u.bb FROM reach r JOIN und u ON r.bb = u.a),
         comp AS (SELECT a AS doc_id, least(a, min(bb)) AS cluster FROM reach GROUP BY a),
         lab AS (SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
                 FROM documents d LEFT JOIN comp c USING (doc_id)),
         sizes AS (SELECT cluster, count(*) AS cluster_size FROM lab GROUP BY 1)
         SELECT cluster_size, count(*) AS n_clusters,
           cluster_size * count(*) AS n_docs
         FROM sizes GROUP BY 1 ORDER BY cluster_size""",
    // q60: same slice+zip bigram generation, rank after the prune
    "q60_bigrams" ->
      """WITH t AS (SELECT list_filter(string_split(text, ' '),
                                       x -> x <> '') AS ws
                    FROM documents),
         pr AS (SELECT unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS p
                FROM t WHERE len(ws) >= 2),
         c AS (SELECT p[1] AS w1, p[2] AS w2, count(*) AS cnt
               FROM pr GROUP BY 1, 2 HAVING count(*) >= 2)
         SELECT w1, w2, cnt, rank FROM (
           SELECT w1, w2, cnt,
             row_number() OVER (PARTITION BY w1
               ORDER BY cnt DESC, w2 ASC) AS rank
           FROM c) WHERE rank <= 3
         ORDER BY w1, rank""",
    // q61: the oracle re-extracts the <a> tags from the SAME constructed
    // html with its own RE2 regexps, restates the resolution rule (scheme
    // prefix = absolute; leading / = host-join; else directory-join) and
    // the full q44 canonicalization, independently of the Spark exprs
    "q61_extract_links" -> (linkEdgeCtes +
      """
         SELECT s.cu AS src_url, k.pos, k.href, d.cu AS dst_url, k.anchor
         FROM keep k JOIN cn s ON s.u = k.src JOIN cn d ON d.u = k.resolved
         ORDER BY src_url, pos"""),
    // q62: anchor rollup over the SAME re-extracted edges — count per
    // (dst, anchor), rank by (n DESC, anchor ASC), per-dst src totals
    "q62_anchor_stats" -> (linkEdgeCtes +
      """,
         an AS (SELECT d.cu AS dst_url, k.anchor,
             count(*) AS n, count(DISTINCT s.cu) AS srcs
           FROM keep k JOIN cn s ON s.u = k.src
                       JOIN cn d ON d.u = k.resolved
           WHERE k.anchor <> '' GROUP BY 1, 2),
         r AS (SELECT dst_url, anchor, n,
             row_number() OVER (PARTITION BY dst_url
               ORDER BY n DESC, anchor ASC) AS rank,
             CAST(sum(srcs) OVER (PARTITION BY dst_url) AS BIGINT)
               AS n_srcs FROM an)
         SELECT dst_url, anchor, n, rank, n_srcs FROM r
         WHERE rank <= 3 ORDER BY dst_url, rank"""),
    // q63: the delta restated as a full-outer join of the two snapshot
    // selections, status from null-sides + md5 compare
    "q63_crawl_delta" ->
      """WITH a AS (SELECT 'https://s' || (doc_id % 7) || '.com/p' || doc_id
             AS url, md5(text) AS h FROM documents WHERE doc_id % 10 <> 9),
         b AS (SELECT 'https://s' || (doc_id % 7) || '.com/p' || doc_id
             AS url,
             md5(CASE WHEN doc_id % 5 = 0 THEN text || ' updated'
                      ELSE text END) AS h
           FROM documents WHERE doc_id % 10 <> 7)
         SELECT coalesce(a.url, b.url) AS url,
           CASE WHEN a.url IS NULL THEN 'new'
                WHEN b.url IS NULL THEN 'deleted'
                WHEN a.h = b.h THEN 'unchanged'
                ELSE 'changed' END AS status,
           a.h AS old_md5, b.h AS new_md5
         FROM a FULL OUTER JOIN b ON a.url = b.url ORDER BY url""",
    // q64: host rollup over the same re-extracted canonical edges
    "q64_host_graph" -> (linkEdgeCtes +
      """,
         ed AS (SELECT s.cu AS src_url, d.cu AS dst_url
           FROM keep k JOIN cn s ON s.u = k.src
                       JOIN cn d ON d.u = k.resolved),
         h AS (SELECT
             regexp_extract(src_url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS src_host,
             regexp_extract(dst_url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS dst_host,
             src_url FROM ed)
         SELECT src_host, dst_host, count(*) AS n_links,
           count(DISTINCT src_url) AS n_pages,
           src_host = dst_host AS is_internal
         FROM h GROUP BY 1, 2 ORDER BY src_host, dst_host"""),
    // q66: frontier restated over the shared re-extracted edges — NOT IN
    // the crawled union, rollup, deterministic top-20
    "q66_frontier" -> (linkEdgeCtes +
      """,
         ed AS (SELECT s.cu AS src_url, d.cu AS dst_url
           FROM keep k JOIN cn s ON s.u = k.src
                       JOIN cn d ON d.u = k.resolved),
         cr AS (SELECT DISTINCT src_url AS u FROM ed
                UNION
                SELECT DISTINCT 'https://other.org/a-' || (doc_id % 11)
                  || '?x=1' FROM documents WHERE doc_id % 11 < 6),
         f AS (SELECT dst_url, count(DISTINCT src_url) AS n_refs,
                 count(*) AS n_links
               FROM ed WHERE dst_url NOT IN (SELECT u FROM cr)
               GROUP BY 1)
         SELECT dst_url, n_refs, n_links FROM f
         ORDER BY n_refs DESC, dst_url ASC LIMIT 20"""),
    // q77: min-depth BFS restated as a depth-bounded recursive CTE +
    // min() rollup (path multiplicity collapses in the GROUP BY)
    // q79: generated restatement of the KG pipeline's relational tail
    // over the fills parquet the query dumps — see KgTailOracle
    "q79_kg_tail" -> KgTailOracle.sql(KgTailDumpPath),
    // q80: the suffix-rank CONTRACT, stated directly: dense_rank over
    // the per-position suffix strings (ties = equal suffixes share a
    // rank; a proper prefix sorts before its extensions)
    "q80_suffix_ranks" ->
      """WITH p AS (SELECT doc_id, text, unnest(range(length(text))) AS off
             FROM documents WHERE doc_id < 40)
         SELECT doc_id, off,
           CAST(dense_rank() OVER (
             ORDER BY substring(text, CAST(off AS INT) + 1)) AS BIGINT)
             AS rank
         FROM p ORDER BY doc_id, off""",
    // q81: SA adjacency restated with lead() over the FULL-suffix order,
    // LCP by the same monotone capped prefix-compare as the operator
    "q81_longest_repeats" ->
      """WITH p AS (SELECT doc_id, text, unnest(range(length(text))) AS off
             FROM documents),
         o AS (SELECT substring(text, CAST(off AS INT) + 1) AS fullsfx,
                 substring(text, CAST(off AS INT) + 1, 200) AS sfx FROM p),
         q AS (SELECT sfx, lead(sfx) OVER (ORDER BY fullsfx) AS nx FROM o),
         l AS (SELECT sfx AS a,
                 len(list_filter(range(1,
                     greatest(least(len(sfx), len(nx)), 1) + 1),
                   i -> substr(sfx, 1, i) = substr(nx, 1, i))) AS l
               FROM q WHERE nx IS NOT NULL)
         SELECT substr(a, 1, CAST(l AS INT)) AS span,
           CAST(l AS BIGINT) AS lcp, count(*) AS n_pairs
         FROM l WHERE l >= 2 GROUP BY 1, 2
         ORDER BY lcp DESC, span LIMIT 20""",
    // q82: fixed-length span counts — plain sliding-window aggregate
    "q82_char_spans" ->
      """WITH u AS (SELECT text,
             unnest(range(greatest(length(text) - 30, 0) + 1)) AS i
           FROM documents),
         s AS (SELECT substring(text, CAST(i AS INT) + 1, 30) AS span
               FROM u)
         SELECT span, count(*) AS n_occurrences FROM s
         WHERE len(span) >= 30
         GROUP BY 1 HAVING count(*) >= 2
         ORDER BY n_occurrences DESC, span LIMIT 50""",
    "q77_crawl_depth" ->
      """WITH RECURSIVE e AS (SELECT doc_id AS src, doc_id + 1 AS dst
             FROM documents
           UNION ALL SELECT doc_id, doc_id + 2 FROM documents
           UNION ALL SELECT doc_id, (doc_id * 17 + 5) % 101
             FROM documents),
         r AS (SELECT doc_id AS node, CAST(0 AS BIGINT) AS depth
             FROM documents WHERE doc_id IN (0, 7)
           UNION ALL
           SELECT e.dst, r.depth + 1 FROM r JOIN e ON e.src = r.node
           WHERE r.depth < 4)
         SELECT node, min(depth) AS depth FROM r GROUP BY node
         ORDER BY node""",
    // q76: char-pair counts restated — word freq, char split, adjacent
    // pairs by subscript, weighted sum
    "q76_bpe_pairs" ->
      """WITH w AS (SELECT w, count(*) AS cnt FROM (SELECT
             unnest(string_split_regex(lower(text), '\W+')) AS w
             FROM documents) WHERE len(w) > 0 GROUP BY w),
         s AS (SELECT string_split(w, '') AS cs, cnt FROM w),
         p AS (SELECT cs[i] AS l, cs[i + 1] AS r, cnt FROM s,
           LATERAL (SELECT
             unnest(generate_series(1, len(cs) - 1)) AS i) u)
         SELECT l, r, CAST(sum(cnt) AS BIGINT) AS n FROM p
         GROUP BY l, r ORDER BY n DESC, l, r LIMIT 50""",
    // q75: block split via the same sentinel-insert trick (RE2 has no
    // lookahead), tag strip + anchor-length sum per block, integer
    // density threshold; chr(1) is the sentinel
    "q75_main_content" ->
      """WITH p AS (SELECT
             'https://c' || (doc_id % 5) || '.com/p' || doc_id AS url,
             '<html><body><div>menu <a href="/">Home</a> <a href="/x">'
             || 'More links here</a></div>'
             || '<p>article body sentence ' || doc_id
             || ' long enough to clear the floor easily '
             || substr(text, 1, 40) || '</p>'
             || '<p>short</p>'
             || '<div>promo <a href="/buy">Buy item ' || (doc_id % 3)
             || ' now</a></div>'
             || CASE WHEN doc_id % 2 = 0 THEN '<DIV>UPPER promo block '
                  || '<A HREF="/up">Click this upper link now</A></DIV>'
                  ELSE '' END
             || '<footer>site ' || (doc_id % 7)
             || ' <a href="/tos">Terms of service</a></footer>'
             || '</body></html>' AS page_html FROM documents),
         b AS (SELECT url, u.pos, u.block FROM p, LATERAL (SELECT
             unnest(string_split(regexp_replace(p.page_html,
               '(?i)<(p|div|nav|footer|h[1-6])\b', chr(1) || '<\1', 'g'),
               chr(1))) AS block,
             generate_subscripts(string_split(regexp_replace(p.page_html,
               '(?i)<(p|div|nav|footer|h[1-6])\b', chr(1) || '<\1', 'g'),
               chr(1)), 1) AS pos) u),
         m AS (SELECT url, pos,
             trim(regexp_replace(block, '<[^>]*>', ' ', 'g')) AS txt,
             CAST(coalesce(list_sum(list_transform(
               regexp_extract_all(block, '(?i)<a[^>]*>([^<]*)</a>', 1),
               x -> len(x))), 0) AS BIGINT) AS alen
           FROM b)
         SELECT url, count(*) AS n_blocks,
           CAST(coalesce(count(*) FILTER (len(txt) >= 20
               AND alen * 100 <= len(txt) * 30), 0) AS BIGINT) AS n_kept,
           coalesce(string_agg(txt, chr(10) ORDER BY pos)
             FILTER (len(txt) >= 20 AND alen * 100 <= len(txt) * 30), '')
             AS main_text
         FROM m GROUP BY url ORDER BY url""",
    // q71: template collapse restated — NOTE the 'g' flag: DuckDB's
    // regexp_replace is first-match-only by default, Spark's is global
    "q71_url_templates" ->
      """WITH u AS (SELECT 'https://t' || (doc_id % 4) || '.com' ||
             CASE WHEN doc_id % 3 = 0
                    THEN '/item/' || doc_id || '?page=' || (doc_id % 7)
                  WHEN doc_id % 3 = 1 THEN '/post-' || doc_id
                  ELSE '/static/about' END AS url FROM documents)
         SELECT regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS host,
           regexp_replace(regexp_extract(url,
             '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$', 1),
             '[0-9]+', '{N}', 'g') AS template,
           count(*) AS n_urls, min(url) AS example
         FROM u GROUP BY 1, 2 ORDER BY host, template""",
    // q72: longest-prefix resolution restated with a row_number over
    // (prefix length DESC, allow ASC — FALSE sorts first, disallow wins
    // ties); unmatched urls surface the left join's null row -> allowed
    "q72_url_rules" ->
      """WITH u AS (SELECT DISTINCT 'https://r' || (doc_id % 3) || '.com'
             || CASE WHEN doc_id % 2 = 0 THEN '/a/' ELSE '/b/' END
             || (doc_id % 20) AS url FROM documents),
         r(host, path_prefix, allow) AS (VALUES
           ('r0.com', '/a', FALSE), ('r0.com', '/a/1', TRUE),
           ('r1.com', '/', FALSE), ('r1.com', '/b', TRUE)),
         m AS (SELECT url,
             regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS host,
             regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$', 1) AS path
           FROM u),
         j AS (SELECT m.url, r.path_prefix, r.allow
           FROM m LEFT JOIN r ON m.host = r.host
             AND starts_with(m.path, r.path_prefix)),
         w AS (SELECT url, path_prefix, allow, row_number() OVER
             (PARTITION BY url ORDER BY len(path_prefix) DESC,
              allow ASC, path_prefix) AS rn FROM j)
         SELECT url, path_prefix AS matched_prefix,
           coalesce(allow, TRUE) AS allowed
         FROM w WHERE rn = 1 ORDER BY url""",
    // q73: Hamilton apportionment restated in integer arithmetic (// and
    // %); leftover = budget - sum of floors, +1 to the largest remainders
    "q73_crawl_budget" ->
      """WITH dm AS (SELECT 'h' || (doc_id % 7) AS host,
             CAST(sum(doc_id % 13) AS BIGINT) AS demand
           FROM documents GROUP BY 1),
         tt AS (SELECT CAST(sum(demand) AS BIGINT) AS total FROM dm),
         f AS (SELECT host, demand,
             CASE WHEN 1000 >= total THEN demand
                  ELSE (1000 * demand) // total END AS fl,
             CASE WHEN 1000 >= total THEN 0
                  ELSE (1000 * demand) % total END AS rem,
             total FROM dm, tt),
         rk AS (SELECT host, demand, fl,
             row_number() OVER (ORDER BY rem DESC, host ASC) AS rank,
             least(1000, total) -
               CAST(sum(fl) OVER () AS BIGINT) AS leftover
           FROM f)
         SELECT host, demand,
           CAST(fl + CASE WHEN rank <= leftover THEN 1 ELSE 0 END
             AS BIGINT) AS allocated
         FROM rk ORDER BY host""",
    // q74: contingency-cell pair counts; f1 from the ROUNDED p/r exactly
    // like the Spark side
    "q74_cluster_metrics" ->
      """WITH a AS (SELECT doc_id % 40 AS pc, doc_id % 50 AS gc
             FROM documents),
         tp AS (SELECT CAST(coalesce(sum((n * (n - 1)) // 2), 0)
             AS BIGINT) AS tp_pairs
           FROM (SELECT count(*) AS n FROM a GROUP BY pc, gc)),
         pp AS (SELECT CAST(coalesce(sum((n * (n - 1)) // 2), 0)
             AS BIGINT) AS pred_pairs
           FROM (SELECT count(*) AS n FROM a GROUP BY pc)),
         gp AS (SELECT CAST(coalesce(sum((n * (n - 1)) // 2), 0)
             AS BIGINT) AS gold_pairs
           FROM (SELECT count(*) AS n FROM a GROUP BY gc)),
         m AS (SELECT tp_pairs, pred_pairs, gold_pairs,
             CASE WHEN pred_pairs = 0 THEN 0.0
               ELSE round(CAST(tp_pairs AS DOUBLE) / pred_pairs, 12)
               END AS precision,
             CASE WHEN gold_pairs = 0 THEN 0.0
               ELSE round(CAST(tp_pairs AS DOUBLE) / gold_pairs, 12)
               END AS recall
           FROM tp, pp, gp)
         SELECT tp_pairs, pred_pairs, gold_pairs, precision, recall,
           CASE WHEN precision + recall = 0 THEN 0.0
             ELSE round(2 * precision * recall / (precision + recall), 12)
             END AS f1
         FROM m""",
    // q67: run detection restated with lag + running sum over the same
    // deterministic (ts, obj) order; intervals via lead per run
    "q67_fact_intervals" ->
      """WITH obs AS (SELECT 'e' || (user_id % 40) AS subj,
             'p' || (event_id % 3) AS pred,
             'org' || (event_id % 5) AS obj, ts FROM events),
         r AS (SELECT subj, pred, obj, ts,
             CASE WHEN lag(obj) OVER w IS NULL
                    OR lag(obj) OVER w <> obj THEN 1 ELSE 0 END AS nr
           FROM obs
           WINDOW w AS (PARTITION BY subj, pred ORDER BY ts, obj)),
         rr AS (SELECT subj, pred, obj, ts, sum(nr) OVER
             (PARTITION BY subj, pred ORDER BY ts, obj) AS run FROM r),
         g AS (SELECT subj, pred, run, min(obj) AS obj,
             min(ts) AS valid_from, count(*) AS n_obs
           FROM rr GROUP BY 1, 2, 3),
         iv AS (SELECT subj, pred, obj, valid_from,
             lead(valid_from) OVER
               (PARTITION BY subj, pred ORDER BY run) AS valid_to,
             n_obs FROM g)
         SELECT subj, pred, obj, valid_from, valid_to, n_obs FROM iv
         ORDER BY subj, pred, valid_from, obj""",
    // q68: both builds re-derived, full-outer joined on the triple key;
    // scores are max(int)/100.0 — one IEEE division on both engines
    "q68_kg_delta" ->
      """WITH a AS (SELECT 'e' || (doc_id % 30) AS subj,
             'p' || (doc_id % 4) AS pred, 'v' || (doc_id % 6) AS obj,
             max(doc_id % 97) / 100.0 AS score
           FROM documents WHERE doc_id % 10 <> 9 GROUP BY 1, 2, 3),
         b AS (SELECT 'e' || (doc_id % 30) AS subj,
             'p' || (doc_id % 4) AS pred, 'v' || (doc_id % 6) AS obj,
             max((doc_id % 97) +
               CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) / 100.0 AS score
           FROM documents WHERE doc_id % 10 <> 7 GROUP BY 1, 2, 3)
         SELECT coalesce(a.subj, b.subj) AS subj,
           coalesce(a.pred, b.pred) AS pred,
           coalesce(a.obj, b.obj) AS obj,
           a.score AS old_score, b.score AS new_score,
           CASE WHEN a.score IS NULL THEN 'added'
                WHEN b.score IS NULL THEN 'removed'
                WHEN a.score = b.score THEN 'unchanged'
                ELSE 'rescored' END AS status
         FROM a FULL OUTER JOIN b
           ON a.subj = b.subj AND a.pred = b.pred AND a.obj = b.obj
         ORDER BY subj, pred, obj""",
    // q69: per-host line mining restated — distinct (host, url, line),
    // count per (host, md5), host page totals, threshold at >= 0.5
    "q69_boilerplate" ->
      """WITH p AS (SELECT
             'https://h' || (doc_id % 5) || '.com/p' || doc_id AS url,
             'nav h' || (doc_id % 5) || chr(10) ||
             'promo ' || (doc_id % 10) || chr(10) ||
             'deal ' || (doc_id % 15) || chr(10) ||
             'body ' || doc_id || chr(10) ||
             substr(text, 1, 30) AS text FROM documents),
         l AS (SELECT DISTINCT
             regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS host,
             url, md5(u.line) AS h, u.line AS line
           FROM p, LATERAL (SELECT
             unnest(string_split(p.text, chr(10))) AS line) u
           WHERE len(trim(u.line)) > 0),
         hp AS (SELECT regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS host,
             count(DISTINCT url) AS host_pages FROM p GROUP BY 1),
         c AS (SELECT host, h, min(line) AS line, count(*) AS n_pages
           FROM l GROUP BY 1, 2)
         SELECT c.host AS host, c.line AS line, c.n_pages AS n_pages,
           hp.host_pages AS host_pages,
           round(CAST(c.n_pages AS DOUBLE) / hp.host_pages, 12) AS frac
         FROM c JOIN hp ON c.host = hp.host
         WHERE hp.host_pages >= 2 AND c.n_pages >= 2
           AND c.n_pages >= hp.host_pages * 0.5
         ORDER BY host, line""",
    // q70: the q69 mine re-derived, then pages reassembled without the
    // mined (host, line-hash) pairs, order kept by line position
    "q70_strip_boilerplate" ->
      """WITH p AS (SELECT
             'https://h' || (doc_id % 5) || '.com/p' || doc_id AS url,
             'nav h' || (doc_id % 5) || chr(10) ||
             'promo ' || (doc_id % 10) || chr(10) ||
             'deal ' || (doc_id % 15) || chr(10) ||
             'body ' || doc_id || chr(10) ||
             substr(text, 1, 30) AS text FROM documents),
         l AS (SELECT url,
             regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1) AS host,
             u.line AS line, u.pos AS pos
           FROM p, LATERAL (SELECT
             unnest(string_split(p.text, chr(10))) AS line,
             generate_subscripts(string_split(p.text, chr(10)), 1)
               AS pos) u),
         dl AS (SELECT DISTINCT host, url, md5(line) AS h FROM l
           WHERE len(trim(line)) > 0),
         hp AS (SELECT host, count(DISTINCT url) AS host_pages
           FROM (SELECT DISTINCT host, url FROM l) GROUP BY 1),
         c AS (SELECT host, h, count(*) AS n_pages FROM dl GROUP BY 1, 2),
         bo AS (SELECT c.host, c.h FROM c JOIN hp ON c.host = hp.host
           WHERE hp.host_pages >= 2 AND c.n_pages >= 2
             AND c.n_pages >= hp.host_pages * 0.5)
         SELECT l.url AS url, count(*) AS n_lines,
           CAST(coalesce(count(*) FILTER (bo.h IS NULL), 0) AS BIGINT)
             AS n_kept,
           coalesce(string_agg(l.line, chr(10) ORDER BY l.pos)
             FILTER (bo.h IS NULL), '') AS cleaned_text
         FROM l LEFT JOIN bo
           ON bo.host = l.host AND bo.h = md5(l.line)
         GROUP BY l.url ORDER BY url""",
    // q65: first-occurrence keep restated with a row_number over
    // (doc_id, pos) per line hash; blank lines always kept
    "q65_span_dedup" ->
      """WITH p AS (SELECT doc_id,
           'quote ' || (doc_id % 5) || chr(10) ||
           'doc ' || doc_id || ' unique body' || chr(10) ||
           substr(text, 1, 40) || chr(10) ||
           'footer ' || (doc_id % 7) AS text
           FROM documents),
         l AS (SELECT doc_id, u.line, u.pos FROM p,
               LATERAL (SELECT unnest(string_split(p.text, chr(10))) AS line,
                        generate_subscripts(string_split(p.text, chr(10)), 1)
                          AS pos) u),
         w AS (SELECT doc_id, pos, line,
             CASE WHEN len(trim(line)) = 0 THEN TRUE
                  ELSE row_number() OVER (PARTITION BY md5(line)
                         ORDER BY doc_id, pos) = 1 END AS keep
           FROM l)
         SELECT doc_id, count(*) AS n_lines,
           CAST(coalesce(count(*) FILTER (keep), 0) AS BIGINT) AS n_kept,
           coalesce(string_agg(line, chr(10) ORDER BY pos)
             FILTER (keep), '') AS cleaned_text
         FROM w GROUP BY doc_id ORDER BY doc_id""",
    // q57: identical histogram + cumulative bracket, all BIGINT
    "q57_len_quantiles" ->
      """WITH lens AS (SELECT CAST(len(list_filter(string_split(text, ' '),
                                     x -> x <> '')) AS BIGINT) AS n_tokens
                       FROM documents),
         hist AS (SELECT n_tokens, count(*) AS cnt FROM lens GROUP BY 1),
         c AS (SELECT n_tokens, cnt,
                 sum(cnt) OVER (ORDER BY n_tokens
                   ROWS UNBOUNDED PRECEDING) AS cum
               FROM hist),
         tot AS (SELECT sum(cnt) AS n FROM hist)
         SELECT pct, n_tokens
         FROM c, tot, unnest([50, 90, 99]) AS u(pct)
         WHERE (cum - cnt) * 100 < pct * tot.n AND pct * tot.n <= cum * 100
         ORDER BY pct""",
    "q20_embed_topk" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         z AS (SELECT vec_id, unnest(embedding) AS a, unnest(qe) AS b
               FROM embeddings, q WHERE vec_id <> 0),
         s AS (SELECT vec_id,
                 sum(CAST(a AS DOUBLE) * CAST(b AS DOUBLE)) AS dot,
                 sum(CAST(a AS DOUBLE) * CAST(a AS DOUBLE)) AS na,
                 sum(CAST(b AS DOUBLE) * CAST(b AS DOUBLE)) AS nb
               FROM z GROUP BY 1)
         SELECT vec_id, round(dot / sqrt(na * nb), 5) AS cos
         FROM s ORDER BY cos DESC, vec_id LIMIT 10""",
    // SRP-LSH bucketing (q21): same fixed hyperplanes ((i*31 + j*17) % 7 - 3)
    // as the Spark side; members as a sorted string join so the column stays
    // hashable for the driver's pandas compare
    "q21_embed_ann_lsh" ->
      """WITH z AS (SELECT vec_id, unnest(embedding) AS x,
                    unnest(range(len(embedding))) AS i FROM embeddings),
         jj AS (SELECT unnest(range(8)) AS j),
         p AS (SELECT vec_id, j,
                 sum(CAST(x AS DOUBLE) * (CAST((i*31 + j*17) % 7 AS DOUBLE) - 3.0)) AS proj
               FROM z CROSS JOIN jj GROUP BY 1, 2),
         b AS (SELECT vec_id,
                 CAST(sum(CASE WHEN proj >= 0 THEN CAST(round(pow(2, j)) AS BIGINT) ELSE 0 END) AS INTEGER) AS bucket
               FROM p GROUP BY 1)
         SELECT bucket, count(*) AS n,
           string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY vec_id) AS members
         FROM b GROUP BY 1 ORDER BY 1""",
    "q24_embed_neardup" ->
      """WITH z AS (SELECT vec_id, unnest(embedding) AS x,
                    unnest(range(len(embedding))) AS i FROM embeddings),
         jj AS (SELECT unnest(range(8)) AS j),
         p AS (SELECT vec_id, j,
                 sum(CAST(x AS DOUBLE) * (CAST((i*31 + j*17) % 7 AS DOUBLE) - 3.0)) AS proj
               FROM z CROSS JOIN jj GROUP BY 1, 2),
         b AS (SELECT vec_id,
                 sum(CASE WHEN proj >= 0 THEN CAST(round(pow(2, j)) AS BIGINT) ELSE 0 END) AS bucket
               FROM p GROUP BY 1),
         pr AS (SELECT x.vec_id AS v1, y.vec_id AS v2
                FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id),
         u AS (SELECT pr.v1, pr.v2, unnest(ea.embedding) AS xa, unnest(eb.embedding) AS xb
               FROM pr JOIN embeddings ea ON pr.v1 = ea.vec_id
                       JOIN embeddings eb ON pr.v2 = eb.vec_id),
         c AS (SELECT v1, v2,
                 sum(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE)) AS dot,
                 sum(CAST(xa AS DOUBLE) * CAST(xa AS DOUBLE)) AS na,
                 sum(CAST(xb AS DOUBLE) * CAST(xb AS DOUBLE)) AS nb
               FROM u GROUP BY 1, 2)
         SELECT v1, v2, round(dot / (sqrt(na) * sqrt(nb)), 5) AS cos
         FROM c WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.3 ORDER BY v1, v2""",
    "q25_ngram_jaccard" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh0 AS (SELECT doc_id,
                   unnest(list_transform(range(greatest(len(w) - 3, 0) + 1),
                     i -> array_to_string(w[i + 1 : i + 3], ' '))) AS shingle
                 FROM ws),
         sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
         rare AS (SELECT shingle FROM (SELECT shingle, count(*) AS df FROM sh GROUP BY 1)
                  WHERE df <= 1000),
         w AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
         sz AS (SELECT doc_id, count(*) AS sz FROM w GROUP BY 1),
         inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
                   FROM w a JOIN w b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT d1, d2, round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 5) AS jaccard
         FROM inter JOIN sz sa ON d1 = sa.doc_id JOIN sz sb ON d2 = sb.doc_id
         WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.2 ORDER BY d1, d2""",
    "q26_text_quality" ->
      """SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS INTEGER) AS n_tokens,
         (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / length(text) > 0.6
          AND len(regexp_extract_all(text, '\S+')) >= 5
          AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
              / greatest(len(regexp_extract_all(text, '\S+')), 1) < 15) AS quality_ok
         FROM documents ORDER BY doc_id""",
    // q23: both payload paths are deterministic functions of doc_id —
    // every 5th id is a real solid-color PNG whose decoded dimensions and
    // exact channel means (PNG is lossless) mirror featureQuery's
    // generator arithmetic; the rest hit the undecodable-bytes fallback
    "q23_media_features" ->
      """SELECT doc_id AS media_id,
         CASE WHEN doc_id % 5 = 0 THEN 'image/png'
              ELSE 'application/octet-stream' END AS mime,
         (doc_id % 5 = 0) AS decoded,
         CAST(CASE WHEN doc_id % 5 = 0 THEN 8 + doc_id % 9 ELSE -1 END AS INTEGER) AS width,
         CAST(CASE WHEN doc_id % 5 = 0 THEN 8 + doc_id % 7 ELSE -1 END AS INTEGER) AS height,
         CAST(CASE WHEN doc_id % 5 = 0 THEN (doc_id * 37) % 256 ELSE 0 END AS INTEGER) AS mean_r,
         CAST(CASE WHEN doc_id % 5 = 0 THEN (doc_id * 59) % 256 ELSE 0 END AS INTEGER) AS mean_g,
         CAST(CASE WHEN doc_id % 5 = 0 THEN (doc_id * 83) % 256 ELSE 0 END AS INTEGER) AS mean_b
         FROM documents ORDER BY media_id""",
    // q27: the SAME IVF computation as ivfSampleTopK — centroids are the
    // embeddings of vec_ids 1..8; assignment = argmin squared-L2 with
    // min-cid tiebreak; probe = the 3 centroids nearest the query; then
    // exact cosine top-10 inside the probed lists only
    "q27_embed_ivf" ->
      """WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
                       WHERE vec_id BETWEEN 1 AND 8),
         q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         zz AS (SELECT e.vec_id, c.cid, unnest(e.embedding) AS x, unnest(c.ce) AS cx
                FROM embeddings e CROSS JOIN cent c WHERE e.vec_id <> 0),
         dist AS (SELECT vec_id, cid,
                    sum((CAST(x AS DOUBLE) - CAST(cx AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(cx AS DOUBLE))) AS d2
                  FROM zz GROUP BY 1, 2),
         assign AS (SELECT vec_id, cid AS list_id FROM
                     (SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
                      FROM dist) WHERE rn = 1),
         qz AS (SELECT c.cid, unnest(q.qe) AS qx, unnest(c.ce) AS cx
                FROM q CROSS JOIN cent c),
         qdist AS (SELECT cid,
                     sum((CAST(qx AS DOUBLE) - CAST(cx AS DOUBLE)) * (CAST(qx AS DOUBLE) - CAST(cx AS DOUBLE))) AS d2
                   FROM qz GROUP BY 1),
         probe AS (SELECT cid FROM
                    (SELECT cid, row_number() OVER (ORDER BY d2, cid) AS rn FROM qdist)
                   WHERE rn <= 3),
         u AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(q.qe) AS y
               FROM embeddings e
               JOIN assign a ON e.vec_id = a.vec_id
               JOIN probe p ON a.list_id = p.cid
               CROSS JOIN q),
         sc AS (SELECT vec_id, sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
                  sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
                  sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
                FROM u GROUP BY 1)
         SELECT vec_id, round(dot / sqrt(na * nb), 5) AS cos
         FROM sc ORDER BY cos DESC, vec_id LIMIT 10""",
    "q22_simhash" -> simhashOracleSql,
    "q35_docs_rollhash" -> rollingOracleSql,
    // q28: same graph fixture (binary subsidiary tree + member chain over
    // supplier keys), same first-depth-wins closure: h2 = 2-hop joins of
    // the base with itself, anti-joined against the base; h3 = the 2-hop
    // frontier joined with the base, anti-joined against everything
    // accumulated. Scores are powers of 2 -> exact doubles both engines.
    "q28_graph_closure" ->
      """WITH sup AS (SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier),
         base AS (
           SELECT k AS subj, 'org:subsidiaries' AS pred, k*2 AS obj,
                  CAST(0.5 AS DOUBLE) AS score
           FROM sup WHERE k*2 IN (SELECT k FROM sup)
           UNION ALL
           SELECT k, 'org:subsidiaries', k*2+1, CAST(0.5 AS DOUBLE)
           FROM sup WHERE k*2+1 IN (SELECT k FROM sup)
           UNION ALL
           SELECT k, 'org:member_of', k+1,
                  CAST(CASE WHEN k % 2 = 0 THEN 0.5 ELSE 0.25 END AS DOUBLE)
           FROM sup WHERE k+1 IN (SELECT k FROM sup)),
         b AS (SELECT DISTINCT subj, pred, obj, score FROM base),
         h2 AS (SELECT DISTINCT a.subj, a.pred, c.obj, a.score*c.score AS score
                FROM b a JOIN b c
                ON a.obj = c.subj AND a.pred = c.pred AND a.subj <> c.obj),
         f2 AS (SELECT * FROM h2 WHERE NOT EXISTS (
                  SELECT 1 FROM b WHERE b.subj = h2.subj
                  AND b.pred = h2.pred AND b.obj = h2.obj)),
         h3 AS (SELECT DISTINCT a.subj, a.pred, c.obj, a.score*c.score AS score
                FROM f2 a JOIN b c
                ON a.obj = c.subj AND a.pred = c.pred AND a.subj <> c.obj),
         acc2 AS (SELECT * FROM b UNION ALL SELECT * FROM f2),
         f3 AS (SELECT * FROM h3 WHERE NOT EXISTS (
                  SELECT 1 FROM acc2 WHERE acc2.subj = h3.subj
                  AND acc2.pred = h3.pred AND acc2.obj = h3.obj))
         SELECT subj, pred, obj, round(score, 6) AS score
         FROM (SELECT * FROM acc2 UNION ALL SELECT * FROM f3)
         ORDER BY subj, pred, obj""",
    // q29: same two Horn rules applied round-by-round exactly as
    // RuleInference.applyOnce does: derive with both rules over the
    // accumulated table, DISTINCT over (subj,pred,obj,score) — a triple
    // reachable through two different intermediates keeps both score
    // rows — then anti-join on (subj,pred,obj) before the union.
    "q29_graph_rules" ->
      """WITH sup AS (SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier),
         b AS (
           SELECT k AS subj, 'org:subsidiaries' AS pred, k*2 AS obj,
                  CAST(0.5 AS DOUBLE) AS score
           FROM sup WHERE k*2 IN (SELECT k FROM sup)
           UNION ALL
           SELECT k, 'org:subsidiaries', k*2+1, CAST(0.5 AS DOUBLE)
           FROM sup WHERE k*2+1 IN (SELECT k FROM sup)
           UNION ALL
           SELECT k, 'org:top_members/employees', k+100000,
                  CAST(0.25 AS DOUBLE)
           FROM sup),
         d1 AS (SELECT DISTINCT * FROM (
           SELECT a.subj, 'org:subsidiaries' AS pred, c.obj,
                  a.score*c.score*CAST(0.5 AS DOUBLE) AS score
           FROM b a JOIN b c ON a.obj = c.subj AND a.subj <> c.obj
           WHERE a.pred = 'org:subsidiaries' AND c.pred = 'org:subsidiaries'
           UNION ALL
           SELECT a.subj, 'org:top_members/employees', c.obj,
                  a.score*c.score*CAST(0.25 AS DOUBLE)
           FROM b a JOIN b c ON a.obj = c.subj AND a.subj <> c.obj
           WHERE a.pred = 'org:subsidiaries'
           AND c.pred = 'org:top_members/employees')),
         f1 AS (SELECT * FROM d1 WHERE NOT EXISTS (
                  SELECT 1 FROM b WHERE b.subj = d1.subj
                  AND b.pred = d1.pred AND b.obj = d1.obj)),
         r1 AS (SELECT * FROM b UNION ALL SELECT * FROM f1),
         d2 AS (SELECT DISTINCT * FROM (
           SELECT a.subj, 'org:subsidiaries' AS pred, c.obj,
                  a.score*c.score*CAST(0.5 AS DOUBLE) AS score
           FROM r1 a JOIN r1 c ON a.obj = c.subj AND a.subj <> c.obj
           WHERE a.pred = 'org:subsidiaries' AND c.pred = 'org:subsidiaries'
           UNION ALL
           SELECT a.subj, 'org:top_members/employees', c.obj,
                  a.score*c.score*CAST(0.25 AS DOUBLE)
           FROM r1 a JOIN r1 c ON a.obj = c.subj AND a.subj <> c.obj
           WHERE a.pred = 'org:subsidiaries'
           AND c.pred = 'org:top_members/employees')),
         f2 AS (SELECT * FROM d2 WHERE NOT EXISTS (
                  SELECT 1 FROM r1 WHERE r1.subj = d2.subj
                  AND r1.pred = d2.pred AND r1.obj = d2.obj))
         SELECT subj, pred, obj, round(score, 6) AS score
         FROM (SELECT * FROM r1 UNION ALL SELECT * FROM f2)
         ORDER BY subj, pred, obj, score""",
    // q32: the vertex set is the edge endpoints (isolated keys are not
    // labeled); supplier keys are contiguous, so each decade's component
    // label is its minimum present key — computed directly as the
    // closed-form fixpoint the min-label propagation must reach.
    "q32_graph_cc" ->
      """WITH sup AS (SELECT CAST(s_suppkey AS BIGINT) AS k FROM supplier),
         e AS (
           SELECT k AS src, k+1 AS dst FROM sup
           WHERE k % 10 <> 9 AND k+1 IN (SELECT k FROM sup)
           UNION ALL
           SELECT k, k-5 FROM sup
           WHERE k % 10 = 5 AND k-5 IN (SELECT k FROM sup)),
         vset AS (SELECT DISTINCT v FROM
           (SELECT src AS v FROM e UNION ALL SELECT dst AS v FROM e))
         SELECT v, min(v) OVER (PARTITION BY v // 10) AS comp
         FROM vset ORDER BY v""",
    // q33: same bucketing (truncation of a nonnegative score/step ->
    // floor), same reverse-cumulative window, same unrounded P/R feeding
    // f1 with the identical multiply/divide order, rounded at the end.
    "q33_pr_sweep" ->
      """WITH scored AS (SELECT o_custkey AS subj, 'rel' AS pred,
                o_orderkey AS obj,
                CAST(o_orderkey % 100 AS DOUBLE) / 100.0 AS score FROM orders),
         gold AS (SELECT o_custkey AS subj, 'rel' AS pred, o_orderkey AS obj
                  FROM orders WHERE o_orderkey % 3 = 0),
         g AS (SELECT s.subj, s.pred, s.obj,
                 CAST(CAST(floor(s.score / 0.1) AS INTEGER) AS DOUBLE) * 0.1 AS bucket,
                 CASE WHEN gd.obj IS NULL THEN 0 ELSE 1 END AS hit
               FROM scored s LEFT JOIN gold gd USING (subj, pred, obj)),
         pb AS (SELECT bucket, count(*) AS n, sum(hit) AS correct
                FROM g GROUP BY 1),
         ans AS (SELECT greatest(1, count(*)) AS answers FROM
                 (SELECT DISTINCT subj, pred, obj FROM gold)),
         cum AS (SELECT bucket AS threshold,
                   CAST(sum(n) OVER (ORDER BY bucket DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS responses,
                   CAST(sum(correct) OVER (ORDER BY bucket DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS correct
                 FROM pb),
         pr AS (SELECT threshold, responses, correct,
                  CAST(correct AS DOUBLE) / responses AS p,
                  CAST(correct AS DOUBLE) / (SELECT answers FROM ans) AS r
                FROM cum)
         SELECT threshold, responses, correct,
           round(p, 6) AS precision, round(r, 6) AS recall,
           round(CASE WHEN p + r > 0 THEN 2 * p * r / (p + r)
                 ELSE 0.0 END, 6) AS f1
         FROM pr ORDER BY threshold""",
    // q36: the WAV fixture is constant-amplitude mono PCM16 at 8 kHz —
    // the DECODED sample rate, frame count, exact duration (frames are
    // multiples of 8) and exact RMS (all samples equal v) are functions
    // of the id that mirror Multimodal.syntheticWav's arithmetic
    "q36_audio_features" ->
      """SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'audio/wav'
              ELSE 'application/octet-stream' END AS mime,
         (doc_id % 3 = 0) AS decoded,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 8000 ELSE -1 END AS INTEGER) AS sample_rate,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE -1 END AS INTEGER) AS channels,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 400 + (doc_id % 5) * 80 ELSE -1 END AS BIGINT) AS frames,
         CAST(CASE WHEN doc_id % 3 = 0 THEN (400 + (doc_id % 5) * 80) / 8 ELSE -1 END AS BIGINT) AS duration_ms,
         CAST(CASE WHEN doc_id % 3 = 0 THEN 1000 + (doc_id * 131) % 15000 ELSE -1 END AS BIGINT) AS amp_rms
         FROM documents ORDER BY media_id""",
    // q37: RVID clips are solid-color frames; the sampler always includes
    // frame 0 and frame n-1, n = 2 + (id % 7) % 4, so the first/last
    // channel means mirror Multimodal.syntheticRawVideo's arithmetic
    "q37_video_features" ->
      """SELECT doc_id AS media_id,
         CASE WHEN doc_id % 4 = 1 THEN 'video/x-rvid'
              ELSE 'application/octet-stream' END AS mime,
         (doc_id % 4 = 1) AS decoded,
         CAST(CASE WHEN doc_id % 4 = 1 THEN 4 + doc_id % 5 ELSE -1 END AS INTEGER) AS width,
         CAST(CASE WHEN doc_id % 4 = 1 THEN 4 + doc_id % 3 ELSE -1 END AS INTEGER) AS height,
         CAST(CASE WHEN doc_id % 4 = 1 THEN 2 + (doc_id % 7) % 4 ELSE -1 END AS INTEGER) AS n_frames,
         CAST(CASE WHEN doc_id % 4 = 1
              THEN least(4, 2 + (doc_id % 7) % 4) ELSE 0 END AS INTEGER) AS n_sampled,
         CAST(CASE WHEN doc_id % 4 = 1 THEN (doc_id * 11) % 256 ELSE -1 END AS INTEGER) AS first_r,
         CAST(CASE WHEN doc_id % 4 = 1 THEN (doc_id * 13) % 256 ELSE -1 END AS INTEGER) AS first_g,
         CAST(CASE WHEN doc_id % 4 = 1 THEN (doc_id * 17) % 256 ELSE -1 END AS INTEGER) AS first_b,
         CAST(CASE WHEN doc_id % 4 = 1
              THEN (doc_id * 11 + (1 + (doc_id % 7) % 4) * 7) % 256 ELSE -1 END AS INTEGER) AS last_r,
         CAST(CASE WHEN doc_id % 4 = 1
              THEN (doc_id * 13 + (1 + (doc_id % 7) % 4) * 17) % 256 ELSE -1 END AS INTEGER) AS last_g,
         CAST(CASE WHEN doc_id % 4 = 1
              THEN (doc_id * 17 + (1 + (doc_id % 7) % 4) * 29) % 256 ELSE -1 END AS INTEGER) AS last_b
         FROM documents ORDER BY media_id"""
  )

  /** DuckDB mirror of TextStats.rollingMin (generated: the k polynomial
   *  terms written out explicitly — RE2/list_transform recompute the
   *  identical BIGINT window hashes, and unicode() == ascii() on the
   *  normalized [a-z0-9 ] alphabet). */
  private def rollingOracleSql: String = {
    val k = 8
    val terms = (0 until k).map(i =>
      s"CAST(unicode(substr(t, CAST(j + ${i + 1} AS INTEGER), 1)) AS BIGINT) * ${BigInt(31).pow(k - 1 - i).toLong}")
      .mkString(" + ")
    s"""WITH n AS (SELECT doc_id,
          regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS t
          FROM documents)
        SELECT doc_id,
          CASE WHEN length(t) >= $k THEN
            list_min(list_transform(range(0, length(t) - $k + 1), j -> $terms))
          ELSE NULL END AS roll_min
        FROM n ORDER BY doc_id"""
  }

  /** DuckDB mirror of SimHash.simhash64 (generated: 64 per-bit vote sums).
   *  Token hash = first 16 hex chars of md5(token); bit b of that value
   *  lives in hex digit 15 - b/4 (0-indexed from the left), within-digit
   *  bit b%4 — recomputed here with strpos/integer arithmetic, so the
   *  whole fingerprint is integer-exact on both engines. Docs with no
   *  tokens get the all-zero fingerprint via the LEFT JOIN (matching the
   *  Spark side's empty-vote default). */
  /** KMV oracle: the 48-bit hash is the first 12 md5 hex digits as an
   *  integer, restated digit-by-digit (same strpos trick as the simhash
   *  oracle); the estimator is one division of double-exact integers. */
  private def kmvOracleSql(k: Int): String = {
    // 16^(11-i) weights as exact BIGINT literals
    val weighted = (0 until 12).map { i =>
      val w = math.pow(16, 11 - i).toLong
      s"(strpos('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1) * $w"
    }.mkString(" + ")
    val scaleNum = (k - 1).toLong * 281474976710656L // (k-1) * 2^48
    s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS word
                   FROM documents),
        h AS (SELECT DISTINCT CAST($weighted AS BIGINT) AS h
              FROM (SELECT md5(word) AS m FROM w WHERE word <> '')),
        mins AS (SELECT h FROM h ORDER BY h LIMIT $k),
        a AS (SELECT count(*) AS k_actual, max(h) AS kth_hash FROM mins),
        e AS (SELECT count(*) AS exact_distinct FROM h)
        SELECT k_actual, kth_hash,
          CAST($scaleNum AS DOUBLE) / CAST(kth_hash AS DOUBLE) AS estimate,
          exact_distinct
        FROM a, e"""
  }

  private def simhashOracleSql: String = {
    def bitExpr(b: Int): String = {
      val pos = 16 - b / 4 // 1-indexed substr position of the hex digit
      val shift = 1 << (b % 4)
      s"((strpos('0123456789abcdef', substr(m, $pos, 1)) - 1) // $shift) % 2"
    }
    val votes = (0 until 64)
      .map(b => s"sum(CASE WHEN ${bitExpr(b)} = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(", ")
    val bits = (0 until 64)
      .map(b => s"CASE WHEN v$b > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS b$b")
      .mkString(", ")
    val lo = (0 until 32).map(b => s"b$b * ${1L << b}").mkString(" + ")
    val hi = (32 until 64).map(b => s"b$b * ${1L << (b - 32)}").mkString(" + ")
    val bands = (0 until 4).map { k =>
      val terms = (0 until 16).map(i => s"b${k * 16 + i} * ${1L << i}")
        .mkString(" + ")
      s"coalesce(CAST($terms AS BIGINT), 0) AS band$k"
    }.mkString(", ")
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        h AS (SELECT doc_id, md5(word) AS m FROM w WHERE word <> ''),
        v AS (SELECT doc_id, $votes FROM h GROUP BY 1),
        bits AS (SELECT doc_id, $bits FROM v)
        SELECT d.doc_id,
          coalesce(CAST($hi AS BIGINT), 0) AS sim_hi,
          coalesce(CAST($lo AS BIGINT), 0) AS sim_lo,
          $bands
        FROM documents d LEFT JOIN bits ON d.doc_id = bits.doc_id
        ORDER BY d.doc_id"""
  }
}
