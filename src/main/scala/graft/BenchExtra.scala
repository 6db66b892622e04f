package graft

import org.apache.spark.sql.SparkSession

/**
 * Round-6 optimization harness (guide §1): times the driver's headline
 * queries + the KG pipeline WITHOUT the scaling loop, with repeats, so a
 * single optimization can be re-measured in ~a minute instead of ~40.
 * Also dumps `.explain("formatted")` plans for the declared queries
 * (plans/r06/ evidence) and a per-stage split of the KG pipeline.
 *
 * This is measurement-only tooling: `Bench.scala` (the frozen driver
 * contract) is untouched; numbers cited from here are labeled as
 * BenchExtra (best-of-N count() timings at the same session config).
 *
 * Usage:
 *   sbt "runMain graft.BenchExtra"                 # headline + kg, 3 reps
 *   sbt "runMain graft.BenchExtra reps=5 q=q19_docs_minhash_lsh"
 *   sbt "runMain graft.BenchExtra plans=plans/r06 suffix=_before"
 *   sbt "runMain graft.BenchExtra stages"          # kg per-stage split
 */
object BenchExtra {

  private def fd(v: Double, dec: Int): String =
    String.format(java.util.Locale.ROOT, "%." + dec + "f", Double.box(v))

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        sys.props.getOrElse("spark.local.dir", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def pagesDs(spark: SparkSession, n: Int) = {
    import spark.implicits._
    val slices = spark.sparkContext.defaultParallelism * 4
    spark.range(0, n, 1, slices).map(i => graft.fixtures.PageGen.page(i.toInt)._1)
  }

  private def kgRun(spark: SparkSession, n: Int): Double = {
    val (_, sec) = time {
      graft.pipeline.KGPipeline.run(spark, pagesDs(spark, n)).count()
    }
    graft.link.Linker.release()
    spark.sharedState.cacheManager.clearCache()
    sec
  }

  val Headline = Seq("q01_pricing", "q02_noisyor", "q03_argmax",
    "q05_star_join", "q11_running", "q13_docs_tokens",
    "q18_docs_jaccard", "q19_docs_minhash_lsh", "q20_embed_topk")

  def main(args: Array[String]): Unit = {
    val kv = args.filter(_.contains("=")).map { a =>
      val Array(k, v) = a.split("=", 2); k -> v
    }.toMap
    val mode = args.filterNot(_.contains("=")).headOption.getOrElse("bench")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = kv.getOrElse("reps", "3").toInt
    val only = kv.get("q").map(_.split(",").toSeq)
    val kgPages = kv.getOrElse("kgpages",
      if (sfDir.contains("sf0.1")) "20000" else "2000").toInt

    val spark = session(cpus)
    kv.get("plans") match {
      case Some(dir) =>
        val suffix = kv.getOrElse("suffix", "")
        new java.io.File(dir).mkdirs()
        val names = only.getOrElse(Headline)
        names.foreach { name =>
          val df = SparkEntry.queries(name)(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$dir/$name$suffix.txt")
          try w.write(plan) finally w.close()
          println(s"[plans] wrote $dir/$name$suffix.txt")
        }
      case None if mode == "stages" =>
        // KG per-stage split: each stage timed end-to-start (cumulative
        // recompute, count() actions), best-of reps
        import graft.pipeline.KGPipeline
        kgRun(spark, 1000) // warm
        def best(label: String)(f: => Unit): Unit = {
          val ts = (1 to reps).map { _ =>
            val (_, s) = time(f)
            graft.link.Linker.release()
            spark.sharedState.cacheManager.clearCache()
            s
          }
          println(s"[stages] $label min=${fd(ts.min, 3)} all=" +
            ts.map(fd(_, 3)).mkString(","))
        }
        best("pages_only")(pagesDs(spark, kgPages)
          .write.format("noop").mode("overwrite").save())
        best("sentences")(KGPipeline.sentences(spark, pagesDs(spark, kgPages))
          .write.format("noop").mode("overwrite").save())
        best("mention_fills")(KGPipeline.mentionFills(spark,
            KGPipeline.sentences(spark, pagesDs(spark, kgPages)))
          .write.format("noop").mode("overwrite").save())
        best("bags")(KGPipeline.yThenNoisyOrGate(spark,
            KGPipeline.aggregateBags(spark, KGPipeline.mentionFills(spark,
              KGPipeline.sentences(spark, pagesDs(spark, kgPages)))))
          .write.format("noop").mode("overwrite").save())
        best("full_run")(KGPipeline.run(spark, pagesDs(spark, kgPages)).count())
      case None =>
        // headline timing, driver methodology (count()), best-of reps
        SparkEntry.queries("q09_dedup")(spark, sfDir).count()
        kgRun(spark, 1000)
        val names = only.getOrElse(Headline)
        val results = names.map { name =>
          val fn = SparkEntry.queries(name)
          val ts = (1 to reps).map(_ => time(fn(spark, sfDir).count())._2)
          println(s"[extra] $name min=${fd(ts.min, 3)} all=" +
            ts.map(fd(_, 3)).mkString(","))
          name -> ts.min
        }
        val kgTs = if (only.isEmpty) (1 to reps).map(_ => kgRun(spark, kgPages))
                   else Nil
        if (kgTs.nonEmpty)
          println(s"[extra] kg_pipeline min=${fd(kgTs.min, 3)} all=" +
            kgTs.map(fd(_, 3)).mkString(","))
        val total = results.map(_._2).sum + (if (kgTs.nonEmpty) kgTs.min else 0.0)
        println(s"""{"metric":"extra_total","value":${fd(total, 3)},"unit":"sec","queries":{""" +
          (results ++ (if (kgTs.nonEmpty) Seq("kg_pipeline" -> kgTs.min) else Nil))
            .map { case (k, v) => "\"" + k + "\":" + fd(v, 3) }.mkString(",") +
          s"""},"sf":"$sfDir","reps":$reps}""")
    }
    spark.stop()
  }
}
