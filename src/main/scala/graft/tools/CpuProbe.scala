package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolate the pathology: same job with AQE on/off × repartition on/off. */
object CpuProbe {
  private def burn(seed: Long, iters: Int): Long = {
    var h = seed; var k = 0
    while (k < iters) { h = h * 6364136223846793005L + 1442695040888963407L; k += 1 }
    h
  }
  def main(args: Array[String]): Unit = {
    val iters = 2000000
    for (aqe <- Seq(false, true); repart <- Seq(false, true)) {
      val spark = SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val rows = 128
      val t0 = System.nanoTime()
      val base = spark.range(rows).as[Long]
      val d = if (repart) base.repartition(32) else base
      val n = d.map(i => burn(i, iters)).filter(_ != 0).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cpu] aqe=$aqe%-5s repart=$repart%-5s ${rows.toLong*iters/sec/1e6}%8.1f Miter/s ($sec%6.2f s, n=$n)")
      spark.stop()
    }
  }
}
