package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r6 guide-§1 probe: candidate expression/plan variants for the headline
 *  relational queries, timed side by side at the bench config BEFORE any
 *  SparkEntry surgery. Current experiments:
 *  - q01: round(x*100) [BigDecimal per row] vs floor-cast cents
 *  - q05: chained dim-join broadcast vs three independent broadcasts
 *  - q11: same cents comparison under a window. */
object VariantProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .appName("graft-variantprobe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
    def bench(label: String)(df: => DataFrame): Unit = {
      df.count() // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[vp] $label%-28s min=${ts.min}%6.3f all=" +
        ts.map(x => f"$x%.3f").mkString(","))
    }
    val roundCents = (c: org.apache.spark.sql.Column) =>
      round(c * 100).cast("long")
    val floorCents = (c: org.apache.spark.sql.Column) =>
      (c * 100 + 0.5).cast("long")

    for (cents <- Seq("round" -> roundCents, "floor" -> floorCents)) {
      bench(s"q01_${cents._1}") {
        t("lineitem").groupBy($"l_returnflag", $"l_linestatus").agg(
          sum($"l_quantity").as("sum_qty"),
          sum(cents._2($"l_extendedprice")).as("base_cents"),
          sum(cents._2($"l_extendedprice" * (lit(1) - $"l_discount"))).as("disc_cents"),
          count(lit(1)).as("n"))
          .orderBy($"l_returnflag", $"l_linestatus")
      }
      bench(s"q11_${cents._1}") {
        val w = org.apache.spark.sql.expressions.Window.partitionBy($"o_custkey")
          .orderBy($"o_orderdate", $"o_orderkey")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        t("orders").select($"o_custkey", $"o_orderkey",
            sum(cents._2($"o_totalprice")).over(w).as("run_cents"))
          .orderBy($"o_custkey", $"o_orderkey")
      }
    }
    bench("q05_chained_dims") {
      val dims = t("supplier")
        .join(t("nation"), $"s_nationkey" === $"n_nationkey")
        .join(t("region"), $"n_regionkey" === $"r_regionkey")
        .select($"s_suppkey", $"r_name")
      t("lineitem")
        .groupBy($"l_suppkey").agg(
          count(lit(1)).as("_n"), sum($"l_quantity").as("_sq"))
        .join(broadcast(dims), $"l_suppkey" === $"s_suppkey")
        .groupBy($"r_name").agg(
          sum($"_n").as("n"), sum($"_sq").as("sum_qty"))
        .orderBy($"r_name")
    }
    bench("q05_indep_bcasts") {
      t("lineitem")
        .groupBy($"l_suppkey").agg(
          count(lit(1)).as("_n"), sum($"l_quantity").as("_sq"))
        .join(broadcast(t("supplier")), $"l_suppkey" === $"s_suppkey")
        .join(broadcast(t("nation")), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(t("region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name").agg(
          sum($"_n").as("n"), sum($"_sq").as("sum_qty"))
        .orderBy($"r_name")
    }
    spark.stop()
  }
}
