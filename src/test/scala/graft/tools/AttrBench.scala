package graft.tools

import org.apache.spark.unsafe.types.UTF8String

import graft.pipeline.HtmlAttr

/** Driver-side microbench of the html_attr walk vs the regex scan it
  * replaced (round-18 review) — the hot path of outlinksFollow /
  * robotsMeta / canonicalUrl at crawl scale is per-TAG attribute reads. */
object AttrBench {
  def main(args: Array[String]): Unit = {
    val rnd = new java.util.Random(42)
    val n = 200000
    val tags = Array.fill(n) {
      val cls = Array.fill(2 + rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar).mkString
      UTF8String.fromString(
        s"""<a class="$cls x" href="https://ex.com/$cls?q=${rnd.nextInt(99)}" rel="${if (rnd.nextBoolean()) "nofollow" else "me"}" data-k=$cls>""")
    }
    val href = UTF8String.fromString("href")
    val rel = UTF8String.fromString("rel")
    val hrefRegex = java.util.regex.Pattern.compile(
      "(?i)\\bhref\\s*=\\s*[\"']([^\"']*)[\"']")
    var sink = 0L
    def walkPass(): Unit = {
      var i = 0
      while (i < n) {
        val h = HtmlAttr.attrKernel(tags(i), href)
        val r = HtmlAttr.attrKernel(tags(i), rel)
        if (h != null) sink += h.numBytes()
        if (r != null) sink += r.numBytes()
        i += 1
      }
    }
    def regexPass(): Unit = {
      var i = 0
      while (i < n) {
        val m = hrefRegex.matcher(tags(i).toString)
        if (m.find()) sink += m.group(1).length
        i += 1
      }
    }
    walkPass(); regexPass() // JIT warmup
    val t0 = System.nanoTime(); (1 to 10).foreach(_ => walkPass())
    val walk = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime(); (1 to 10).foreach(_ => regexPass())
    val regex = (System.nanoTime() - t1) / 1e9
    // walk reads TWO attributes per tag; regex reads one
    println(f"[attr_bench] walk (2 attrs): ${20.0 * n / walk / 1e6}%.1f M reads/s (${walk / (20.0 * n) * 1e9}%.0f ns/read)")
    println(f"[attr_bench] regex (1 attr): ${10.0 * n / regex / 1e6}%.1f M reads/s (${regex / (10.0 * n) * 1e9}%.0f ns/read) sink=$sink")
  }
}
