package graft.pipeline

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Randomized properties of the round-17 crawl kernels against slow
  * references — pure JVM, no Spark session needed (the RFC-vector
  * golden specs pin the semantics; these hunt the edges the vectors
  * don't enumerate). */
class CrawlKernelPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260816L)

  // ---- robots path patterns: differential against a regex reference

  private def refPatternMatch(pat: String, path: String): Boolean = {
    val anchored = pat.endsWith("$")
    val p = if (anchored) pat.substring(0, pat.length - 1) else pat
    val rx = "^" + p.split("\\*", -1)
      .map(java.util.regex.Pattern.quote).mkString(".*") +
      (if (anchored) "$" else "")
    java.util.regex.Pattern.compile(rx, java.util.regex.Pattern.DOTALL)
      .matcher(path).find()
  }

  test("robots patternMatches is equivalent to the regex reference on " +
    "random patterns and paths") {
    val chars = "ab/."
    def randStr(maxLen: Int, alphabet: String): String =
      Array.fill(rnd.nextInt(maxLen + 1))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
    for (i <- 1 to 5000) {
      val pat = randStr(8, chars + "**") + (if (rnd.nextBoolean()) "$" else "")
      val path = randStr(12, chars)
      val got = Robots.patternMatches(pat, path)
      val want = refPatternMatch(pat, path)
      assert(got == want, s"iter $i: pattern '$pat' vs path '$path': " +
        s"walk=$got regex=$want")
    }
  }

  // ---- URL resolution: structural invariants on random references

  private def res(base: String, ref: String): String = {
    val r = UrlResolve.resolveKernel(
      UTF8String.fromString(base), UTF8String.fromString(ref))
    if (r == null) null else r.toString
  }

  private def randRef(): String = {
    val segs = Seq("a", "b", "..", ".", "x1")
    def path(n: Int): String =
      Seq.fill(n)(segs(rnd.nextInt(segs.length))).mkString("/")
    rnd.nextInt(6) match {
      case 0 => path(1 + rnd.nextInt(4))                  // relative
      case 1 => "/" + path(rnd.nextInt(4))                // rooted
      case 2 => "?q=" + rnd.nextInt(10)                   // query-only
      case 3 => "//h" + rnd.nextInt(3) + "/" + path(1)    // protocol-relative
      case 4 => "http://h" + rnd.nextInt(3) + "/" + path(1) // absolute
      case _ => path(rnd.nextInt(3)) + "#f" + rnd.nextInt(5) // with fragment
    }
  }

  test("resolve of a random ref against an absolute base is absolute, " +
    "dot-free, and a re-resolve fixed point") {
    for (i <- 1 to 5000) {
      val base = "http://host/" + Seq.fill(rnd.nextInt(4))(
        "abc".charAt(rnd.nextInt(3)).toString).mkString("/")
      val ref = randRef()
      val out = res(base, ref)
      assert(out != null, s"iter $i: null for base '$base' ref '$ref'")
      assert(out.matches("^[A-Za-z][A-Za-z0-9+.-]*:.*"),
        s"iter $i: '$out' is not absolute (base '$base' ref '$ref')")
      // the resolved path never retains a complete dot segment
      val p = out.replaceFirst("^[^:]+://[^/?#]*", "")
        .takeWhile(c => c != '?' && c != '#')
      assert(!p.split("/", -1).exists(s => s == "." || s == ".."),
        s"iter $i: dot segment survived in '$out' (base '$base' ref '$ref')")
      // resolving the RESULT (it has a scheme) is the identity
      assert(res(base, out) == out,
        s"iter $i: re-resolve moved '$out' (base '$base' ref '$ref')")
    }
  }

  test("stripTrackingParams never grows a URL, is idempotent, and " +
    "preserves non-tracking params verbatim") {
    val spark = graft.SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val params = Seq("utm_source=x", "utm_medium=m", "gclid=1", "fbclid=2",
      "msclkid=3", "id=7", "a=1", "b=", "utmost=keep")
    val urls = (1 to 300).map { _ =>
      val n = rnd.nextInt(5)
      val q = Seq.fill(n)(params(rnd.nextInt(params.length))).mkString("&")
      "https://h/p" + (if (rnd.nextBoolean() && q.nonEmpty) "?" + q else "")
    }
    val once = urls.toDF("u")
      .select(TextAnalysis.stripTrackingParams(col("u")).as("s"))
      .as[String].collect().toSeq
    val twice = once.toDF("u")
      .select(TextAnalysis.stripTrackingParams(col("u")).as("s"))
      .as[String].collect().toSeq
    assert(once == twice, "not idempotent")
    urls.zip(once).foreach { case (u, s) =>
      assert(s.length <= u.length, s"grew: '$u' -> '$s'")
      val keep = u.dropWhile(_ != '?').drop(1).split("&").filter(p =>
        p.nonEmpty && !p.toLowerCase.matches("^(utm_[a-z0-9_]*|gclid|fbclid|msclkid)=.*"))
      val got = s.dropWhile(_ != '?').drop(1).split("&").filter(_.nonEmpty)
      assert(got.toSeq == keep.toSeq, s"params drifted: '$u' -> '$s'")
    }
  }
}
