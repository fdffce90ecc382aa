package graft.tools

import org.apache.spark.unsafe.types.UTF8String

import graft.fuzzy.Kernels

/** Same-JVM A/B of the bounded-levenshtein kernel: the r18 banded two-row
  * DP (inlined below as the reference) vs the r19 Landau-Vishkin diagonal
  * kernel (`Kernels.levBoundedAscii`), on the two corpus shapes the bench
  * actually runs:
  *   - "names": 18-char strings, threshold 90 => k = 1 (fuzzy_exact_*,
  *     sf1_exact_8g, sf1_auto_22g's exact fallback)
  *   - "annf": 30-char strings, threshold 90 => k = 3 (fuzzy_annf_3g_exact)
  * Pairs are pre-generated with a realistic alphabet; a small fraction are
  * true typo pairs so the accept path is exercised too. Agreement is
  * asserted on every pair.
  */
object KernelAb {

  /** r18 implementation, verbatim (for the A/B only). */
  def levBoundedAsciiBanded(a: UTF8String, b: UTF8String, k: Int): Int = {
    var aStart = 0
    var aEnd = a.numBytes
    var bStart = 0
    var bEnd = b.numBytes
    while (aStart < aEnd && bStart < bEnd && a.getByte(aStart) == b.getByte(bStart)) {
      aStart += 1; bStart += 1
    }
    while (aEnd > aStart && bEnd > bStart && a.getByte(aEnd - 1) == b.getByte(bEnd - 1)) {
      aEnd -= 1; bEnd -= 1
    }
    val n = aEnd - aStart
    val m = bEnd - bStart
    if (math.abs(n - m) > k) return k + 1
    if (n == 0) return m
    if (m == 0) return n
    val inf = k + 1
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    java.util.Arrays.fill(prev, inf)
    var j = 0
    val kEff = math.min(k, math.max(n, m))
    while (j <= math.min(m, kEff)) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      val lo = math.max(1, i - kEff)
      val hi = math.min(m, i + kEff)
      if (lo == 1 && i <= kEff) cur(0) = i
      var rowMin = if (lo == 1 && i <= kEff) i else inf
      val ca = a.getByte(aStart + i - 1)
      j = lo
      while (j <= hi) {
        val cost = if (ca == b.getByte(bStart + j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = cur(j - 1) + 1
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin >= inf) return inf
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    math.min(prev(m), inf)
  }

  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(17)
    val chars = "abcdefghijklmnopqrstuvwxyz .,0123456789"
    def mk(len: Int): String =
      (0 until len).map(_ => chars(rnd.nextInt(chars.length))).mkString
    def typo(s: String): String = {
      val p = rnd.nextInt(s.length)
      s.substring(0, p) + s.substring(p + 1)
    }
    def corpus(len: Int, n: Int): (Array[UTF8String], Array[UTF8String]) = {
      val a = Array.fill(n)(mk(len))
      val b = a.map { s =>
        if (rnd.nextDouble() < 0.005) typo(s) else mk(len) // 0.5% true pairs
      }
      (a.map(UTF8String.fromString), b.map(UTF8String.fromString))
    }
    def bench(name: String, k: Int, la: Array[UTF8String], lb: Array[UTF8String]): Unit = {
      val n = la.length
      // agreement check
      var i = 0
      while (i < n) {
        val o = levBoundedAsciiBanded(la(i), lb(i), k)
        val d = Kernels.levBoundedAscii(la(i), lb(i), k)
        require(o == d, s"disagreement on '${la(i)}' vs '${lb(i)}' k=$k: old=$o new=$d")
        i += 1
      }
      def time(f: (UTF8String, UTF8String, Int) => Int, reps: Int): Double = {
        var acc = 0L
        val t0 = System.nanoTime()
        var r = 0
        while (r < reps) {
          var i = 0
          while (i < n) { acc += f(la(i), lb(i), k); i += 1 }
          r += 1
        }
        val dt = (System.nanoTime() - t0).toDouble / (reps.toLong * n)
        if (acc == 42) println("?") // defeat DCE
        dt
      }
      // warmup
      time(levBoundedAsciiBanded, 3); time(Kernels.levBoundedAscii, 3)
      val old = (0 until 3).map(_ => time(levBoundedAsciiBanded, 10)).min
      val neu = (0 until 3).map(_ => time(Kernels.levBoundedAscii, 10)).min
      println(f"[kernel-ab] $name%-22s k=$k  old=$old%7.1f ns/pair  new=$neu%7.1f ns/pair  speedup=${old / neu}%5.2fx")
    }
    val (n18a, n18b) = corpus(18, 200000)
    bench("names 18ch (k=1)", 1, n18a, n18b)
    val (n30a, n30b) = corpus(30, 200000)
    bench("annf 30ch (k=3)", 3, n30a, n30b)
    // shared-prefix corpus (customer-name shape): the strip, not the DP,
    // dominates here — the word-wise strip targets exactly this
    def digits(n: Int): String = (0 until n).map(_ => ('0' + rnd.nextInt(10)).toChar).mkString
    val ca = Array.fill(200000)("customer#" + digits(9)).map(UTF8String.fromString)
    val cb = Array.fill(200000)("customer#" + digits(9)).map(UTF8String.fromString)
    bench("customer 18ch (k=1)", 1, ca, cb)
    // the mask gate's effect estimate: fraction of random pairs the
    // xor+popcount pre-filter would skip at each shape
    def maskStats(name: String, k: Int, la: Array[UTF8String], lb: Array[UTF8String]): Unit = {
      var pruned = 0
      var i = 0
      while (i < la.length) {
        val ma = graft.fuzzy.VectorKernels.charMask(la(i))
        val mb = graft.fuzzy.VectorKernels.charMask(lb(i))
        if (ma != 0 && mb != 0 && java.lang.Long.bitCount(ma ^ mb) > 2 * k) pruned += 1
        i += 1
      }
      println(f"[kernel-ab] $name%-22s mask gate prunes ${100.0 * pruned / la.length}%5.1f%% of pairs")
    }
    maskStats("names 18ch (k=1)", 1, n18a, n18b)
    maskStats("annf 30ch (k=3)", 3, n30a, n30b)
  }
}
