package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale micro-benchmark for the native vector kernels vs the HOF folds
 *  they replaced (`functions/VectorExpressions.scala`): generates
 *  nVectors×dim float embeddings from `spark.range` (never collected),
 *  then times a full-scan cosine-vs-constant + SRP-bucket aggregation
 *  under each implementation. The sf0.1 embeddings table is too small to
 *  show the per-row allocation cost the kernels remove — this probe runs
 *  at a size where the scan is compute-bound.
 *
 *  `runMain graft.tools.VecBench [nVectors] [dim] [reps]`
 */
object VecBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val dim = if (args.length > 1) args(1).toInt else 64
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-vecbench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        sys.props.getOrElse("spark.local.dir", "/dev/shm/graft-spark"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic float arrays from the row id (no Random in executors)
    val emb = spark.range(n).repartition(cpus * 4)
      .withColumn("embedding", expr(
        s"transform(sequence(0, ${dim - 1}), " +
          "i -> CAST(((id * 1103515245 + i * 12345) % 1000 - 500) / 37.0 AS FLOAT))"))
      .persist()
    emb.count() // materialize out of the timing loop

    val qe = typedLit((0 until dim).map(i => ((i * 7919) % 1000 - 500) / 37.0f))

    val hofDot = expr("aggregate(zip_with(embedding, qe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    val hofNorm = expr("aggregate(embedding, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")
    def hofSrp(bits: Int) = (0 until bits).map { j =>
      val proj = expr(
        s"""aggregate(zip_with(embedding, sequence(0, size(embedding)-1),
            (x, i) -> CAST(x AS DOUBLE) * (CAST((i * 31 + $j * 17) % 7 AS DOUBLE) - 3.0)),
            CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
      when(proj >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.count() // warm codegen
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        df.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"[vecbench] $label n=$n dim=$dim min=" +
        String.format(java.util.Locale.ROOT, "%.2f", Double.box(ts.min)) +
        "s times=" + ts.map(t =>
          String.format(java.util.Locale.ROOT, "%.2f", Double.box(t)))
        .mkString(","))
    }

    val e = emb.withColumn("qe", qe)
    time("cosine_hof") {
      e.select((hofDot / sqrt(hofNorm)).as("c")).filter($"c" > 1e9)
    }
    time("cosine_native") {
      e.select((graft.functions.vec.dot($"embedding", $"qe") /
        sqrt(graft.functions.vec.normSq($"embedding"))).as("c"))
        .filter($"c" > 1e9)
    }
    time("srp12_hof") {
      emb.select(hofSrp(12).as("b")).groupBy($"b").count()
    }
    time("srp12_native") {
      emb.select(graft.functions.vec.srpBucket($"embedding", 12).as("b"))
        .groupBy($"b").count()
    }
    spark.stop()
  }
}
