package graft.tools
import org.apache.spark.sql.SparkSession
object ScaleOnly {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    for (cpus <- Seq(8, 32)) {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/graft-spark")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      def pages(m: Int) = spark.range(m).map(i => graft.fixtures.PageGen.page(i.toInt)._1)
      graft.pipeline.KGPipeline.run(spark, pages(1000)).count() // warm
      val t0 = System.nanoTime()
      graft.pipeline.KGPipeline.run(spark, pages(n)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] cpus=$cpus n=$n ${n / sec}%9.1f pages/s ($sec%7.1f s)")
      spark.stop()
    }
  }
}
