package graft.tools
object PlainLoop {
  def main(args: Array[String]): Unit = {
    // first-touch throughput: allocate + touch fresh arrays
    for (n <- Seq(1, 8, 32); r <- 1 to 2) {
      val bytesPerThread = 2L * 1024 * 1024 * 1024 / n
      val t0 = System.nanoTime()
      val ts = (1 to n).map { _ =>
        new Thread(() => {
          var done = 0L
          while (done < bytesPerThread) {
            val a = new Array[Byte](4 * 1024 * 1024)
            var i = 0
            while (i < a.length) { a(i) = 1; i += 4096 }
            done += a.length
          }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[mem] threads=$n%2d round=$r alloc+touch 2GiB in $sec%6.2f s (${2048 / sec}%7.1f MiB/s)")
    }
  }
}
