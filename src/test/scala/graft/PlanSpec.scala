package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Physical-plan hygiene: the plans we'd want at 100 TB, asserted
 *  (SURVEY.md §4) — pushdown reaches the scan, small dims broadcast,
 *  column ops stay inside whole-stage codegen. */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("filter + projection push down to the parquet scan") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }

  test("star join broadcasts the dimension side") {
    val plan = SparkEntry.queries("q05_star_join")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SMJ:\n$plan")
  }

  test("aggregation query runs inside whole-stage codegen") {
    val df = SparkEntry.queries("q01_pricing")(spark, dir)
    df.collect() // finalize the AQE plan
    val plan = df.queryExecution.executedPlan.toString
    // AQE's final-plan format prints WholeStageCodegen stages as "*(n)"
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"no WSCG:\n$plan")
  }

  test("argmax/top-k plans are hash aggregates, not rank-filter windows") {
    // the round-4 de-window: a Window(row_number) would globally sort
    // the fact table by a multi-column key; the struct-max / collect+
    // slice forms keep it one hash aggregate (the final presentation
    // orderBy on the small result is fine)
    Seq("q03_argmax", "q04_topk").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name still uses a window:\n$plan")
      // max(struct)/collect_list buffers are complex-typed, so Spark
      // plans SortAggregate (partition-LOCAL sort + partial agg), not
      // HashAggregate — still no global sort of the fact table, which
      // is the property this test pins
      assert(plan.contains("Aggregate"), s"$name not an aggregate:\n$plan")
    }
  }

  test("q19 LSH is equi-joins on band keys, never a nested-loop join") {
    val df = SparkEntry.queries("q19_docs_minhash_lsh")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"non-equi join in the LSH candidate path:\n$plan")
  }

  test("triangle + pagerank plans are keyed equi-joins, never nested loops") {
    for (q <- Seq("q48_graph_triangles", "q49_pagerank")) {
      val df = SparkEntry.queries(q)(spark, dir)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"non-equi join in $q:\n$plan")
    }
  }

  test("cooccurrence pairs are generated scan-side: exactly one exchange") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"a b c d$i e")).toDF("doc_id", "text")
    val df = graft.text.TextStats.cooccurrence(docs, window = 2)
    df.collect()
    // count only the AQE final plan, not the echoed "Initial Plan" section
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"expected pair generation inside the scan stage (1 shuffle), got $exchanges:\n$plan")
  }

  test("dupSpans shuffles carry md5 hashes, not span text") {
    import spark.implicits._
    val docs = (0L until 50L)
      .map(i => (i, s"w$i a b c d e f g h i j k")).toDF("doc_id", "text")
    val df = graft.dedup.NearDup.dupSpans(spark, docs, n = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the gram-count exchange partitions on the projected hash column,
    // which means md5 was computed BEFORE the shuffle boundary
    assert("Exchange hashpartitioning\\(_h".r.findFirstIn(plan).isDefined,
      s"gram shuffle not keyed on the hash column:\n$plan")
  }

  test("pipeline shuffle count stays bounded (distinct exchanges)") {
    import spark.implicits._
    val (pages, _) = graft.fixtures.PageGen.corpus(10)
    val tri = graft.pipeline.KGPipeline.run(spark, spark.createDataset(pages))
    tri.collect()
    val plan = tri.queryExecution.executedPlan.toString
    // the textual plan repeats shared subtrees (the alias map feeds two
    // joins) — count DISTINCT physical exchanges by plan_id
    val ids = "Exchange hashpartitioning[^\\n]*plan_id=(\\d+)".r
      .findAllMatchIn(plan).map(_.group(1)).toSet
    // expected: bag agg + names-distinct + block groupBy + the fused
    // consistency+materialize group = 4; the driver union-find replaced
    // the old 2-round propagation joins and the triple merge fused into
    // the consistency shuffle (was 14 exchanges in round 1)
    assert(ids.size <= 6, s"exchange explosion (${ids.size}):\n$plan")
  }

  test("incremental reuse filter is a broadcast anti-join on the dropped set") {
    import spark.implicits._
    val (pages, _) = graft.fixtures.PageGen.corpus(30)
    val prev = spark.createDataset(pages)
    val next = spark.createDataset(pages.drop(5) ++
      Seq(graft.fixtures.PageGen.page(900)._1))
    val prevFills = graft.pipeline.KGPipeline.mentionFills(spark,
      graft.pipeline.KGPipeline.sentences(spark, prev))
    val fills = graft.pipeline.KGPipeline.incrementalFillsSig(spark,
      graft.pipeline.KGPipeline.pageSignatures(prev), prevFills, next)
    fills.collect()
    val plan = fills.queryExecution.executedPlan.toString
    // the reused side must anti-join against the SMALL dropped set via
    // broadcast — a sort-merge anti/semi join here means the build side
    // was the corpus-sized unchanged set (the shape IncrProbe caught)
    assert("BroadcastHashJoin[^\\n]*LeftAnti".r.findFirstIn(plan).isDefined,
      s"no broadcast anti-join:\n$plan")
    graft.pipeline.KGPipeline.releaseIncrementalDelta()
  }

  test("URL rules resolve via broadcast join; budget window stays host-level") {
    import spark.implicits._
    val urls = (0 until 200).map(i => s"https://x.com/a/$i").toDF("url")
    val rules = Seq(("x.com", "/a", false), ("x.com", "/a/1", true))
      .toDF("host", "path_prefix", "allow")
    val out = graft.text.Links.applyUrlRules(urls, rules)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"rules not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"rule join shuffled:\n$plan")
    // crawlBudget's only window input is the HOST-level demand table —
    // the url table never reaches a window (policy cardinality, not
    // corpus cardinality)
    val demand = urls
      .groupBy(lit("x.com").as("host"))
      .agg(count(lit(1)).as("demand"))
    val alloc = graft.text.Links.crawlBudget(demand, 10L)
    val wins = "Window".r.findAllIn(
      alloc.queryExecution.executedPlan.toString).size
    assert(alloc.collect().map(_.getLong(2)).sum == 10L)
    assert(wins >= 1) // window exists, but only over the host rollup
  }

  test("alias dictionary rewrite is a broadcast join, never a shuffle") {
    import spark.implicits._
    val prov = graft.model.Provenance("d", "u", 0, 0, 1, 2, 3)
    // "GDC" shares the acronym block with "Global Dynamics Corp" -> one
    // real alias row -> the rewrite join must broadcast it
    val fills = spark.createDataset(Seq(
      graft.model.SlotFill("Global Dynamics Corp", "ORGANIZATION",
        "org:founded", "1990-XX-XX", "DATE", 0.9, prov),
      graft.model.SlotFill("GDC", "ORGANIZATION",
        "org:city_of_headquarters", "Paris", "CITY", 0.9, prov)))
    val out = graft.link.Linker.canonicalize(spark, fills)
    val subjects = out.collect().map(_.subj).toSet
    assert(subjects == Set("Global Dynamics Corp"), s"not linked: $subjects")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"alias map not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"alias join shuffled:\n$plan")
  }

  test("IVF probe prunes the list_id-partitioned assigned table at the scan") {
    import spark.implicits._
    import graft.dedup.NearDup
    // the 100-TB deployment shape: fit once, WRITE the assigned table
    // partitioned by list_id, probe many — each probe's list filter must
    // become PARTITION PRUNING at the parquet scan (read ~nProbe/nLists
    // of the corpus), not a post-scan Filter over everything
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val idx = NearDup.ivfFit(spark, emb, nLists = 4)
    val tmp = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    idx.assigned.write.mode("overwrite").partitionBy("list_id").parquet(tmp)
    val onDisk = NearDup.IvfIndex(spark.read.parquet(tmp), idx.centers)
    val query = emb.filter($"vec_id" === 0)
      .select($"embedding").as[Seq[Float]].head().toArray
    val probe = NearDup.ivfProbe(spark, onDisk, query, k = 5, nProbe = 2)
    val rows = probe.collect()
    assert(rows.length == 5)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list_id"),
      s"list filter did not reach the scan as partition pruning:\n$plan")
    // and the probed lists match the in-memory index's answer exactly
    val inMem = NearDup.ivfProbe(spark, idx, query, k = 5, nProbe = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
    assert(rows.map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos")))
      .sameElements(inMem))
  }

  test("the full official ontology is extracted end-to-end") {
    import spark.implicits._
    val (pages, gold) = graft.fixtures.PageGen.corpus(120)
    // every canonical relation, canonicalized to its official 2013 name
    // (member_of + employee_of merge into employee_or_member_of)
    val expected = graft.model.Relations.names
      .map(graft.model.Relations.officialName).toSet
    val goldPreds = gold.map(_.pred)
    assert(goldPreds == expected,
      s"gold/ontology mismatch: missing=${expected -- goldPreds} extra=${goldPreds -- expected}")
    val got = graft.pipeline.KGPipeline.run(spark, spark.createDataset(pages))
      .select("pred").distinct().as[String].collect().toSet
    assert(goldPreds.subsetOf(got),
      s"missing relations: ${goldPreds -- got}")
  }
}
