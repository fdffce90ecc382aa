package graft.fuzzy

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Randomized properties of the round-5 kernels (int8 quantization,
  * integer dot, Morton interleave, random projection) against slow
  * references — pure JVM, no Spark session needed.
  */
class NewKernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260813L)

  private def randVec(n: Int): Array[Float] =
    Array.fill(n)((rnd.nextDouble() * 2 - 1).toFloat)

  test("quantizeI8: bounds, sign, zero map, and reconstruction error") {
    for (_ <- 1 to 200) {
      val v = randVec(1 + rnd.nextInt(96))
      val q = VectorKernels.quantizeI8(ArrayData.toArrayData(v)).toByteArray()
      assert(q.length === v.length)
      val ma = v.map(x => math.abs(x.toDouble)).max
      if (ma == 0.0) assert(q.forall(_ == 0))
      else {
        assert(q.forall(b => b >= -127 && b <= 127))
        val scale = ma / 127.0
        v.zip(q).foreach { case (x, b) =>
          // floor semantics: q*scale <= x < (q+1)*scale
          assert(b * scale <= x.toDouble + 1e-12 && x.toDouble < (b + 1) * scale + 1e-12,
            s"x=$x q=$b scale=$scale")
        }
      }
    }
  }

  test("dotI8 equals the BigInt reference and is symmetric") {
    for (_ <- 1 to 200) {
      val n = 1 + rnd.nextInt(80)
      val a = Array.fill(n)((rnd.nextInt(255) - 127).toByte)
      val b = Array.fill(n)((rnd.nextInt(255) - 127).toByte)
      val ad = ArrayData.toArrayData(a)
      val bd = ArrayData.toArrayData(b)
      val want = a.zip(b).map { case (x, y) => BigInt(x.toInt) * BigInt(y.toInt) }.sum
      assert(BigInt(VectorKernels.dotI8(ad, bd)) === want)
      assert(VectorKernels.dotI8(ad, bd) === VectorKernels.dotI8(bd, ad))
    }
  }

  test("interleave31: bit-exact vs reference, bounded, order-preserving per key") {
    def slow(a: Long, b: Long): Long =
      (0 until 31).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    for (_ <- 1 to 500) {
      val a = rnd.nextLong() & 0x7FFFFFFFL
      val b = rnd.nextLong() & 0x7FFFFFFFL
      val z = VectorKernels.interleave31(a, b)
      assert(z === slow(a, b))
      assert(z >= 0L, "z-value must stay non-negative (sort-safe as signed long)")
      // monotone in each argument with the other fixed
      if (a < 0x7FFFFFFFL) assert(VectorKernels.interleave31(a + 1, b) > z)
      if (b < 0x7FFFFFFFL) assert(VectorKernels.interleave31(a, b + 1) > z)
    }
  }

  test("projectF is linear within float tolerance; projectQ is exactly additive in planes") {
    val dim = 32
    val planes = Array.fill(4 * dim)(rnd.nextGaussian())
    for (_ <- 1 to 50) {
      val v = randVec(dim)
      val w = randVec(dim)
      val pv = VectorKernels.projectF(ArrayData.toArrayData(v), planes, dim, 4).toFloatArray()
      val pw = VectorKernels.projectF(ArrayData.toArrayData(w), planes, dim, 4).toFloatArray()
      val sum = v.zip(w).map { case (x, y) => x + y }
      val psum = VectorKernels.projectF(ArrayData.toArrayData(sum), planes, dim, 4).toFloatArray()
      pv.indices.foreach { i =>
        assert(math.abs(psum(i) - (pv(i) + pw(i))) < 1e-3,
          s"projection not linear at $i: ${psum(i)} vs ${pv(i) + pw(i)}")
      }
    }
    // integer variant: component p is an exact dot of quantized v and plane p
    val iplanes = Array.fill(4 * dim)((rnd.nextInt(2000) - 1000).toLong)
    val v = randVec(dim)
    val got = VectorKernels.projectQ(ArrayData.toArrayData(v), iplanes, dim, 4).toLongArray()
    val qv = v.map(x => math.floor(x.toDouble * 4096.0).toLong)
    val want = (0 until 4).map(p => (0 until dim).map(d => qv(d) * iplanes(p * dim + d)).sum)
    assert(got.toSeq === want)
  }
}
