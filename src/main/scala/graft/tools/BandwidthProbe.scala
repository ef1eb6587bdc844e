package graft.tools

/** Memory-bandwidth scaling probe (dev tool, BASELINE.md evidence): N
  * threads each stream-sum a private 256 MiB long array; aggregate GB/s
  * per thread count shows where THIS box's DRAM saturates. If aggregate
  * bandwidth plateaus by ~8-16 threads, then a memory-bound stage (the
  * string-heavy page scan) cannot wall-clock-scale past that point on one
  * box no matter how it is coded — while a real 4N-executor cluster adds
  * sockets (and bandwidth) with every executor. Pure JVM, no Spark.
  */
object BandwidthProbe {

  private val WordsPerThread = 32 * 1024 * 1024 // 256 MiB of longs

  private def streamSum(a: Array[Long], passes: Int): Long = {
    var s = 0L
    var p = 0
    while (p < passes) {
      var i = 0
      while (i < a.length) { s += a(i); i += 8 } // stride 64 B = line rate
      p += 1
    }
    s
  }

  def main(args: Array[String]): Unit = {
    val levels = Seq(1, 2, 4, 8, 16, 32)
    val passes = 20
    // Allocate per level ON DEMAND (peak 8 GiB only at 32 threads): an
    // eager full allocation would OOM a small-heap JVM before the 1- and
    // 2-thread rows — which need only 256-512 MiB — ever print.
    val arrays = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    def ensure(n: Int): Unit =
      while (arrays.length < n)
        arrays += Array.tabulate(WordsPerThread)(i =>
          (i * 2654435761L) ^ arrays.length)
    ensure(1)
    streamSum(arrays(0), 2) // JIT warm
    levels.foreach { n =>
      ensure(n)
      val t0 = System.nanoTime()
      val threads = (0 until n).map { t =>
        val th = new Thread(() => {
          if (streamSum(arrays(t), passes) == 42L) System.err.println("")
        })
        th.start(); th
      }
      threads.foreach(_.join())
      val sec = (System.nanoTime() - t0) / 1e9
      // DRAM traffic: stride 8 longs = one read per 64 B cache line, so
      // every line of the array is fetched once per pass — the full
      // 256 MiB/pass/thread reaches memory even though only 1/8 of the
      // words are summed.
      val gb = n.toLong * passes * (WordsPerThread.toLong * 8) / 1e9
      println(f"[bw] threads=$n%2d wall=$sec%6.2f s touched=$gb%7.1f GB agg=${gb / sec}%6.1f GB/s per-thread=${gb / sec / n}%5.2f GB/s")
    }
  }
}
