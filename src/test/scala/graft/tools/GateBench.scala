package graft.tools

import org.apache.spark.unsafe.types.UTF8String
import graft.fuzzy.VectorKernels

/** Driver-side microbench of the per-pair jaccard gate kernel. */
object GateBench {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val n = 200000
    val strs = Array.fill(n) {
      val sb = new StringBuilder
      (0 until 30).foreach(_ => sb.append(('a' + rnd.nextInt(26)).toChar))
      UTF8String.fromString(sb.toString)
    }
    var sink = 0.0
    // warmup
    var i = 0
    while (i < n - 1) { sink += VectorKernels.ngramJaccardDist(strs(i), strs(i + 1), 3); i += 1 }
    val t0 = System.nanoTime()
    var reps = 0
    while (reps < 10) {
      i = 0
      while (i < n - 1) { sink += VectorKernels.ngramJaccardDist(strs(i), strs(i + 1), 3); i += 1 }
      reps += 1
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"ngramJaccardDist: ${10.0 * (n - 1) / dt / 1e6}%.1f M pairs/s (${dt / (10.0 * (n - 1)) * 1e9}%.0f ns/pair) sink=$sink%.1f")
  }
}
