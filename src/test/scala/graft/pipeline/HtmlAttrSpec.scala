package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** [[HtmlAttr]] — the attribute walk that replaced the regex scans
  * (round-18 review): golden vectors including the two adversarial
  * modes the regexes got wrong, plus the HTML5 microsyntax corners. */
class HtmlAttrSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def a(tag: String, name: String): Option[String] =
    Option(HtmlAttr.attrKernel(
      UTF8String.fromString(tag), UTF8String.fromString(name)))
      .map(_.toString)

  test("golden vectors: quoting forms, case, bare booleans, absent") {
    val t = "<a HREF=\"https://x/y\" rel='me fol' async data-x=7 checked>"
    assert(a(t, "href").contains("https://x/y")) // name case-insensitive
    assert(a(t, "rel").contains("me fol")) // single-quoted, spaces kept
    assert(a(t, "data-x").contains("7")) // unquoted
    assert(a(t, "async").contains("")) // bare boolean -> '' (HTML5)
    assert(a(t, "checked").contains("")) // bare boolean before '>'
    assert(a(t, "missing").isEmpty) // absent -> null
  }

  test("adversarial: attribute-looking text inside a quoted VALUE never " +
    "matches, and unquoted values stop at whitespace") {
    // rel= inside the href value — the regex filter's false-drop mode
    val t1 = "<a href=\"https://ex.com/out?rel=nofollow\">"
    assert(a(t1, "rel").isEmpty && a(t1, "href")
      .contains("https://ex.com/out?rel=nofollow"))
    // unquoted rel followed by an href containing 'nofollow' letters:
    // the value ends at the whitespace, never crossing into href
    val t2 = "<a rel=me href=https://ex.com/nofollow-faq>"
    assert(a(t2, "rel").contains("me"))
    assert(a(t2, "href").contains("https://ex.com/nofollow-faq"))
    // name=robots inside another attribute's value (the meta false-gate)
    val t3 = "<meta content=\"see name=robots noindex docs\">"
    assert(a(t3, "name").isEmpty)
    assert(a(t3, "content").contains("see name=robots noindex docs"))
  }

  test("microsyntax corners: ws around '=', self-closing slash, first " +
    "occurrence wins, empty quoted value, glued text is tag name") {
    assert(a("<a href = \"x\"/>", "href").contains("x"))
    assert(a("<a a=1 a=2>", "a").contains("1"))
    assert(a("<a x=\"\">", "x").contains(""))
    // vertical-tab separator (isWs includes \u000B, superset of HTML5)
    assert(a("<a\u000Bhref=y>", "href").contains("y"))
    // no whitespace after the tag name: 'ahref=y' is all tag name
    assert(a("<ahref=y>", "href").isEmpty)
    assert(a("<br/>", "href").isEmpty)
    assert(a("<a>", "href").isEmpty)
  }

  test("expression + SQL registration: nulls null, walk matches kernel") {
    val rows = Seq(
      (0L, "<a href=\"u\" rel=nofollow x>", "rel"),
      (1L, "<a href=\"u\">", "rel"),
      (2L, null, "rel"),
      (3L, "<a x=1>", null))
      .toDF("id", "tag", "name")
    val viaCol = rows.select(col("id"),
        HtmlAttr.attr(col("tag"), col("name")).as("v"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(viaCol == Map(0L -> Some("nofollow"), 1L -> None,
      2L -> None, 3L -> None))
    rows.createOrReplaceTempView("html_attr_spec")
    val viaSql = spark.sql(
      "SELECT id, html_attr(tag, name) AS v FROM html_attr_spec")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(viaSql == viaCol)
  }
}
