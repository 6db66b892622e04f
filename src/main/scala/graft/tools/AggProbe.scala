package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r6 guide-§1 probe: which aggregate buffer types keep HashAggregate in
 *  this Spark build? BagProbe showed max(struct(score, prov)) planning as
 *  SortAggregate (sort on both sides of the exchange); before rewriting
 *  the argmax stages, pin down empirically which forms stay hash-based:
 *  max over primitives, strings, primitive structs, string structs, and
 *  max_by variants. */
object AggProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("aggprobe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = spark.range(1000).select($"id" % 10 as "k",
      $"id" as "v", concat(lit("s"), $"id") as "s",
      ($"id" % 7).cast("double") as "d")
    def shape(label: String)(c: org.apache.spark.sql.Column): Unit = {
      val plan = df.groupBy($"k").agg(c.as("a"))
        .queryExecution.executedPlan.toString
      val kind =
        if (plan.contains("SortAggregate")) "SortAggregate"
        else if (plan.contains("ObjectHashAggregate")) "ObjectHashAggregate"
        else if (plan.contains("HashAggregate")) "HashAggregate"
        else "???"
      println(f"[aggprobe] $label%-34s $kind")
    }
    shape("max(long)")(max($"v"))
    shape("max(string)")(max($"s"))
    shape("max(struct(long,long))")(max(struct($"v", $"v" * 2)))
    shape("max(struct(double,long))")(max(struct($"d", $"v")))
    shape("max(struct(long,string))")(max(struct($"v", $"s")))
    shape("max_by(long,long)")(max_by($"v", $"v"))
    shape("max_by(string,long)")(max_by($"s", $"v"))
    shape("max_by(string,double)")(max_by($"s", $"d"))
    shape("max_by(string,struct(d,s))")(max_by($"s", struct($"d", $"s")))
    shape("max_by(struct(s,s),double)")(max_by(struct($"s", $"s" as "t"), $"d"))
    shape("collect_list(long)")(collect_list($"v"))
    shape("sum(double)+?")(sum(log1p(-$"d")))
    spark.stop()
  }
}
