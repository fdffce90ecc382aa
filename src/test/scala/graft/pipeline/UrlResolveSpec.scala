package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[UrlResolve]] against the RFC's OWN example tables — §5.4.1 (normal)
  * and §5.4.2 (abnormal) are public reference-resolution test vectors,
  * every row pinned verbatim. Plus the expression-layer contracts
  * (nulls, scheme-less base, SQL registration, codegen path). */
class UrlResolveSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Base = "http://a/b/c/d;p?q"

  private def res(ref: String, base: String = Base): String = {
    val r = UrlResolve.resolveKernel(
      UTF8String.fromString(base), UTF8String.fromString(ref))
    if (r == null) null else r.toString
  }

  test("RFC 3986 §5.4.1: normal examples, verbatim") {
    val expected = Seq(
      "g:h" -> "g:h",
      "g" -> "http://a/b/c/g",
      "./g" -> "http://a/b/c/g",
      "g/" -> "http://a/b/c/g/",
      "/g" -> "http://a/g",
      "//g" -> "http://g",
      "?y" -> "http://a/b/c/d;p?y",
      "g?y" -> "http://a/b/c/g?y",
      "#s" -> "http://a/b/c/d;p?q#s",
      "g#s" -> "http://a/b/c/g#s",
      "g?y#s" -> "http://a/b/c/g?y#s",
      ";x" -> "http://a/b/c/;x",
      "g;x" -> "http://a/b/c/g;x",
      "g;x?y#s" -> "http://a/b/c/g;x?y#s",
      "" -> "http://a/b/c/d;p?q",
      "." -> "http://a/b/c/",
      "./" -> "http://a/b/c/",
      ".." -> "http://a/b/",
      "../" -> "http://a/b/",
      "../g" -> "http://a/b/g",
      "../.." -> "http://a/",
      "../../" -> "http://a/",
      "../../g" -> "http://a/g")
    for ((ref, want) <- expected)
      assert(res(ref) == want, s"resolve('$ref') gave '${res(ref)}', want '$want'")
  }

  test("RFC 3986 §5.4.2: abnormal examples, verbatim (strict form)") {
    val expected = Seq(
      // more ".." than path segments
      "../../../g" -> "http://a/g",
      "../../../../g" -> "http://a/g",
      // dot-segments that are not complete path segments
      "/./g" -> "http://a/g",
      "/../g" -> "http://a/g",
      "g." -> "http://a/b/c/g.",
      ".g" -> "http://a/b/c/.g",
      "g.." -> "http://a/b/c/g..",
      "..g" -> "http://a/b/c/..g",
      // nonsensical dot-segment forms
      "./../g" -> "http://a/b/g",
      "./g/." -> "http://a/b/c/g/",
      "g/./h" -> "http://a/b/c/g/h",
      "g/../h" -> "http://a/b/c/h",
      "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
      "g;x=1/../y" -> "http://a/b/c/y",
      // query/fragment are never part of the path
      "g?y/./x" -> "http://a/b/c/g?y/./x",
      "g?y/../x" -> "http://a/b/c/g?y/../x",
      "g#s/./x" -> "http://a/b/c/g#s/./x",
      "g#s/../x" -> "http://a/b/c/g#s/../x",
      // strict parser: a ref with its own scheme is taken as-is
      "http:g" -> "http:g")
    for ((ref, want) <- expected)
      assert(res(ref) == want, s"resolve('$ref') gave '${res(ref)}', want '$want'")
  }

  test("contracts: scheme-less base is null, not a throw; empty-path " +
    "base merges at root") {
    assert(res("g", base = "/no/scheme") == null)
    assert(res("g", base = "relative") == null)
    // base with authority and EMPTY path: merge prepends "/" (§5.2.3)
    assert(res("g", base = "http://host") == "http://host/g")
    assert(res("?q=1", base = "http://host") == "http://host?q=1")
  }

  test("expression layer: nulls propagate, DataFrame codegen and SQL " +
    "registration agree with the kernel") {
    val rows = Seq(
      (0L, Base, "../g"),
      (1L, null, "g"),
      (2L, Base, null),
      (3L, "nope", "g"))
      .toDF("id", "base", "ref")
    val df = rows.select(col("id"),
      UrlResolve.resolve(col("base"), col("ref")).as("u"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("u"))).toMap
    assert(df(0L).contains("http://a/b/g"))
    assert(df(1L).isEmpty && df(2L).isEmpty && df(3L).isEmpty)
    rows.createOrReplaceTempView("url_resolve_spec")
    val sql = spark.sql(
      "SELECT id, resolve_url(base, ref) AS u FROM url_resolve_spec")
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("u"))).toMap
    assert(sql == df)
  }

  test("outlinksResolved: relative/rooted/query/protocol-relative links " +
    "resolve against the page URI, non-http schemes drop, results " +
    "normalize and dedup") {
    val page = "<a href=\"img.png\">i</a><a href=\"../up.html\">u</a>" +
      "<a href=\"/rooted?x=1\">r</a><a href=\"?q=2\">q</a>" +
      "<script src=\"//CDN.example.com:443/c.js\"></script>" +
      "<a href=\"./here/.././sib.html\">s</a>" +
      "<a href=\"HTTP://Ex.COM:80/abs#f\">a</a>" +
      "<a href=\"mailto:x@y.z\">m</a><a href=\"#frag\">f</a>" +
      "<a href=\"img.png#other\">dup</a>" +
      "<a href=unq.html>uq</a>" // unquoted relative resolves too (r17 item 2)
    val out = Seq(("https://example.com/a/7/page.html", page))
      .toDF("base", "html")
      .select(TextAnalysis.outlinksResolved($"html", $"base"))
      .as[Seq[String]].collect().head
    assert(out == Seq(
      "https://example.com/a/7/img.png",
      "https://example.com/a/up.html",
      "https://example.com/rooted?x=1",
      "https://example.com/a/7/page.html?q=2",
      "https://cdn.example.com/c.js",
      "https://example.com/a/7/sib.html",
      "http://ex.com/abs",
      "https://example.com/a/7/page.html",
      "https://example.com/a/7/unq.html"), s"got $out")
  }
}
