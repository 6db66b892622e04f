package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query timing probe: `runMain graft.tools.QProbe q02_noisyor 5`
 *  times one SparkEntry query N times at the bench config so a headline
 *  regression can be re-measured in isolation (VERDICT r3: q02 moved
 *  11.8 -> 14.3 s between driver artifacts with no plan change — decide
 *  host noise vs plan defect before any surgery). */
object QProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q02_noisyor"
    val reps = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-qprobe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir",
        sys.props.getOrElse("spark.local.dir", "/dev/shm/graft-spark"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm (codegen + file listing)
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println(s"[qprobe] $name sf=$sfDir cpus=$cpus times=" +
      times.map(t => String.format(java.util.Locale.ROOT, "%.2f", Double.box(t)))
        .mkString(",") +
      " min=" + String.format(java.util.Locale.ROOT, "%.2f", Double.box(times.min)))
    spark.stop()
  }
}
