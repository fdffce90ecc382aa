package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `html_attr(tag, name)` — ONE attribute's value out of ONE tag's text
  * (`<a href="..." rel=nofollow>`), parsed with a real attribute walk
  * instead of a regex over the raw tag string. The regex approach
  * cannot respect attribute boundaries: `rel=` inside a quoted href
  * VALUE, or a value scan running across the whitespace after an
  * unquoted attribute into its neighbor, both produce false matches
  * (round-18 review findings). The walk implements the HTML5 attribute
  * microsyntax: names case-insensitive; `= value` optional (a bare
  * boolean attribute yields the empty string, per spec); values
  * double-quoted, single-quoted, or unquoted (terminated by whitespace
  * or `>`); quoted values are opaque units — their content can never
  * start or satisfy another attribute match. Returns null when the tag
  * declares no such attribute.
  *
  * Known boundary: the TAG text itself is usually cut with a
  * `<tag\b[^>]*>` regex upstream, which truncates at a literal `>`
  * inside a quoted attribute value — rare in real markup and the same
  * posture as [[TextAnalysis.stripMarkup]].
  *
  * The kernel is a static forwarder callable from whole-stage codegen;
  * it allocates nothing on the miss path. Not SQL-replayable in DuckDB
  * (no attribute walk there), so consumers carry reconstruction oracles
  * pinned by adversarial golden specs instead of replay oracles. */
object HtmlAttr {

  /** Column API: the value of attribute `name` in `tag` text, null when
    * absent, '' for a bare boolean attribute. */
  def attr(tag: Column, name: Column): Column =
    GraftSql.column(HtmlAttrValue(GraftSql.expression(tag),
      GraftSql.expression(name)))

  private[graft] def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] =
    Seq("html_attr" -> (exprs => HtmlAttrValue(exprs(0), exprs(1))))

  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

  /** Codegen entry: attribute walk over the tag text. May return null
    * (attribute absent) — callers hand-roll the post-call null check.
    * Allocation-light (third-review finding): attribute names compare
    * via regionMatches (no per-attribute substring), values extract only
    * for the matching attribute; the miss path allocates just the one
    * decoded tag string. */
  def attrKernel(tag: UTF8String, name: UTF8String): UTF8String = {
    val s = tag.toString
    val want = name.toString
    val wl = want.length
    val n = s.length
    var i = 0
    // skip "<tagname" (everything up to the first whitespace or '>')
    while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '>') i += 1
    while (i < n) {
      // between attributes: whitespace and stray '/' (self-closing)
      while (i < n && (isWs(s.charAt(i)) || s.charAt(i) == '/')) i += 1
      if (i >= n || s.charAt(i) == '>') return null
      val nameStart = i
      while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '=' &&
        s.charAt(i) != '>' && s.charAt(i) != '/') i += 1
      val matched = (i - nameStart) == wl &&
        s.regionMatches(true, nameStart, want, 0, wl)
      while (i < n && isWs(s.charAt(i))) i += 1
      var valueStart = -1
      var valueEnd = -1
      if (i < n && s.charAt(i) == '=') {
        i += 1
        while (i < n && isWs(s.charAt(i))) i += 1
        if (i < n && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
          val q = s.charAt(i)
          i += 1
          valueStart = i
          while (i < n && s.charAt(i) != q) i += 1
          valueEnd = i
          if (i < n) i += 1 // consume the closing quote
        } else {
          valueStart = i
          while (i < n && !isWs(s.charAt(i)) && s.charAt(i) != '>') i += 1
          valueEnd = i
        }
      }
      if (matched) return UTF8String.fromString(
        if (valueStart < 0) "" else s.substring(valueStart, valueEnd))
    }
    null
  }
}

/** `html_attr(tag STRING, name STRING) -> STRING` — see [[HtmlAttr]].
  * Null inputs → null; an absent attribute → null; a bare boolean
  * attribute → ''. Hand-rolled codegen: the kernel itself returns null
  * on the miss path, which `defineCodeGen` would not re-check. */
case class HtmlAttrValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
      right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) arguments")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "html_attr"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val tag = left.eval(input)
    val name = right.eval(input)
    if (tag == null || name == null) null
    else HtmlAttr.attrKernel(tag.asInstanceOf[UTF8String],
      name.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val tagGen = left.genCode(ctx)
    val nameGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${tagGen.code}
      ${nameGen.code}
      boolean ${ev.isNull} = ${tagGen.isNull} || ${nameGen.isNull};
      UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        ${ev.value} = graft.pipeline.HtmlAttr.attrKernel(
          ${tagGen.value}, ${nameGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
