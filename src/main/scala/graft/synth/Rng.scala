package graft.synth

/** Splittable, counter-based deterministic PRNG (splitmix64 finalizer).
  *
  * Every random draw is a pure function of (seed, counter) — no mutable
  * stream state — so the synthesized pages table is byte-identical at any
  * parallelism / partition count (SURVEY.md §7.5 #4). splitmix64 constants
  * are the public-domain ones from Steele et al., "Fast Splittable
  * Pseudorandom Number Generators" (OOPSLA 2014).
  */
object Rng {

  /** Mix a 64-bit key into a well-distributed 64-bit value. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic draw for stream `seed`, element `i`, sub-draw `j`. */
  def at(seed: Long, i: Long, j: Long): Long =
    mix64(mix64(mix64(seed) ^ i) ^ j)

  /** Uniform int in [0, n). */
  def nextInt(seed: Long, i: Long, j: Long, n: Int): Int = {
    require(n > 0)
    (java.lang.Long.remainderUnsigned(at(seed, i, j), n.toLong)).toInt
  }

  /** Uniform double in [0, 1). */
  def nextDouble(seed: Long, i: Long, j: Long): Double =
    (at(seed, i, j) >>> 11).toDouble / (1L << 53).toDouble

  /** Zipf-ish rank draw in [0, n): rank r with weight ~ 1/(r+1).
    * Inverse-CDF via a cached cumulative table + binary search (the CDF for
    * a given n is deterministic, so caching preserves reproducibility).
    */
  def nextZipf(seed: Long, i: Long, j: Long, n: Int): Int = {
    val cdf = zipfCdf(n)
    val u = nextDouble(seed, i, j)
    val idx = java.util.Arrays.binarySearch(cdf, u)
    val r = if (idx >= 0) idx + 1 else -idx - 1
    math.min(r, n - 1)
  }

  private val zipfCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()

  private def zipfCdf(n: Int): Array[Double] =
    zipfCache.computeIfAbsent(n, { m =>
      val w = Array.tabulate(m)(r => 1.0 / (r + 1))
      val total = w.sum
      val cdf = new Array[Double](m)
      var acc = 0.0
      var r = 0
      while (r < m) { acc += w(r) / total; cdf(r) = acc; r += 1 }
      cdf
    })
}
