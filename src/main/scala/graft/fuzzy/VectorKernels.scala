package graft.fuzzy

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels for vector / sketch operators, callable from generated
  * code (static forwarders). These replace `transform`/`aggregate`
  * higher-order expressions on the hot paths: Spark evaluates HOF lambdas
  * interpreted per element, which benchmarked ~20-100x slower than these
  * loops at sf0.1.
  */
object VectorKernels {

  /** Dot product of two float-array columns (double accumulation,
    * left-to-right — same sum order as the DuckDB oracle). */
  def dotF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** xxhash64-style seeded hash of a UTF8String via Spark's own XXH64. */
  @inline private def seededHash(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, org.apache.spark.sql.types.StringType, seed)

  /** SplitMix64 finalizer — the standard 64-bit avalanche mix. */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature: hash-once + k cheap permutations. Each shingle is
    * xxhash64'd exactly ONCE (reading its bytes is the expensive part);
    * permutation j re-avalanches the 64-bit hash as SplitMix64(h ^ c_j) —
    * a full-mix bijection per lane (a bare multiply-add family measurably
    * degrades band-collision recall on small gram sets). This replaces k
    * full passes over every shingle's bytes with one pass plus ~6 ALU ops
    * per shingle per lane. */
  def minhash(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val base = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        base(m) = seededHash(shingles.getUTF8String(i), 0L)
        m += 1
      }
      i += 1
    }
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val c = mix64(j.toLong)
      var mn = Long.MaxValue
      i = 0
      while (i < m) {
        val h = mix64(base(i) ^ c)
        if (h < mn) mn = h
        i += 1
      }
      out(j) = mn
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Fraction of agreeing positions between two equal-length MinHash
    * signatures — the standard unbiased Jaccard estimator. Tight loop over
    * long arrays; replaces an interpreted `zip_with`+`aggregate` pair that
    * dominated the minhash verify stage. */
  def sigAgreement(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var agree = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) agree += 1
      i += 1
    }
    agree.toDouble / n
  }

  /** 64-bit SimHash over a string token array: per bit, sign of the sum of
    * +-1 votes from each token's hash. */
  def simhash(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = seededHash(tokens.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Winnowing sketch: hash every k-char gram of `text`, keep the min hash
    * of each sliding window, distinct. Returns sorted minima. */
  def winnow(text: UTF8String, k: Int, window: Int): ArrayData = {
    val s = text.toString
    val nGrams = math.max(s.length - k + 1, 1)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      hashes(i) = seededHash(UTF8String.fromString(s.substring(i, math.min(i + k, s.length))), 7L)
      i += 1
    }
    val nWin = math.max(nGrams - window + 1, 1)
    val out = new java.util.TreeSet[java.lang.Long]()
    var w = 0
    while (w < nWin) {
      var mn = Long.MaxValue
      var j = w
      val end = math.min(w + window, nGrams)
      while (j < end) {
        if (hashes(j) < mn) mn = hashes(j)
        j += 1
      }
      out.add(mn)
      w += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator()
    var x = 0
    while (it.hasNext) { arr(x) = it.next(); x += 1 }
    ArrayData.toArrayData(arr)
  }

  /** Sign-LSH bits: pack sign(dot(v, plane_i)) into a long. `planes` is a
    * flattened row-major (nPlanes x dim) matrix. */
  def signBits(v: ArrayData, planes: Array[Double], dim: Int): Long = {
    val nPlanes = planes.length / dim
    val n = math.min(v.numElements(), dim)
    var bits = 0L
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var i = 0
      val off = p * dim
      while (i < n) {
        dot += v.getFloat(i).toDouble * planes(off + i)
        i += 1
      }
      if (dot > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  /** Character n-grams of a string (duplicates kept; a string shorter than
    * n collapses to itself, so the gram set is never empty). */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    if (str.length < n)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](UTF8String.fromString(str)))
    else {
      val cnt = str.length - n + 1
      val out = new Array[Any](cnt)
      var i = 0
      while (i < cnt) {
        out(i) = UTF8String.fromString(str.substring(i, i + n))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** LSH band keys: one combined hash per band over `rows` consecutive
    * signature entries (band index mixed in so bands never collide). */
  def bandKeys(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L ^ b
      var r = 0
      while (r < rows) {
        val v = sig.getLong(b * rows + r)
        h = h * 31 + v
        h ^= (h >>> 27)
        r += 1
      }
      out(b) = h
      b += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Sorted distinct grams of an ASCII string, each n<=4 gram packed into
    * one Int (bytes are the gram identity — no String allocation). */
  private def gramIntsAscii(s: UTF8String, n: Int): Array[Int] = {
    val len = s.numBytes
    val cnt = if (len < n) 1 else len - n + 1
    val out = new Array[Int](cnt)
    if (len < n) {
      var packed = 0
      var i = 0
      while (i < len) { packed = (packed << 8) | (s.getByte(i) & 0xff); i += 1 }
      out(0) = packed
    } else {
      var i = 0
      while (i < cnt) {
        var packed = 0
        var j = 0
        while (j < n) { packed = (packed << 8) | (s.getByte(i + j) & 0xff); j += 1 }
        out(i) = packed
        i += 1
      }
      java.util.Arrays.sort(out)
    }
    out
  }

  /** Intersection size of two sorted arrays counting DISTINCT values. */
  private def sortedDistinctIntersect(a: Array[Int], b: Array[Int]): (Int, Int, Int) = {
    var i = 0; var j = 0
    var inter = 0; var da = 0; var db = 0
    while (i < a.length || j < b.length) {
      if (i < a.length && (j >= b.length || a(i) < b(j))) {
        da += 1
        val v = a(i); while (i < a.length && a(i) == v) i += 1
      } else if (j < b.length && (i >= a.length || b(j) < a(i))) {
        db += 1
        val v = b(j); while (j < b.length && b(j) == v) j += 1
      } else {
        da += 1; db += 1; inter += 1
        val v = a(i)
        while (i < a.length && a(i) == v) i += 1
        while (j < b.length && b(j) == v) j += 1
      }
    }
    (inter, da, db)
  }

  /** Normalized Jaccard DISTANCE between the char n-gram SETS of two
    * strings. ASCII + n<=4 fast path packs grams into Ints (zero String
    * allocation — this runs once per LSH candidate pair, tens of millions
    * of times per join); generic path falls back to hashed grams. */
  def ngramJaccardDist(a: UTF8String, b: UTF8String, n: Int): Double = {
    if (n <= 4 && a.numChars == a.numBytes && b.numChars == b.numBytes) {
      val ga = gramIntsAscii(a, n)
      val gb = gramIntsAscii(b, n)
      val (inter, da, db) = sortedDistinctIntersect(ga, gb)
      val union = da + db - inter
      if (union == 0) 0.0 else 1.0 - inter.toDouble / union
    } else {
      val sa = new java.util.HashSet[String]()
      val sb = new java.util.HashSet[String]()
      val as = a.toString
      val bs = b.toString
      if (as.length < n) sa.add(as)
      else { var i = 0; while (i <= as.length - n) { sa.add(as.substring(i, i + n)); i += 1 } }
      if (bs.length < n) sb.add(bs)
      else { var i = 0; while (i <= bs.length - n) { sb.add(bs.substring(i, i + n)); i += 1 } }
      var inter = 0
      val it = sa.iterator()
      while (it.hasNext) if (sb.contains(it.next())) inter += 1
      val union = sa.size() + sb.size() - inter
      if (union == 0) 0.0 else 1.0 - inter.toDouble / union
    }
  }
}
