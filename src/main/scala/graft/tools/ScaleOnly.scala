package graft.tools
import org.apache.spark.sql.SparkSession
object ScaleOnly {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val levels = if (args.length > 1) args(1).split(",").toSeq.map(_.toInt)
      else Seq(8, 32)
    for (cpus <- levels) {
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
      // a stopped context lingers as the active/default session; the next
      // getOrCreate would hand back its dead BlockManagerMaster
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
