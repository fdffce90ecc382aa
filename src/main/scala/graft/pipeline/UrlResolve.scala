package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §5 reference resolution — `resolve_url(base, ref)` — the
  * step [[TextAnalysis.outlinks]] needs to cover the links real pages
  * mostly carry: RELATIVE references (`img.png`, `../up`, `/rooted`,
  * `?q=`, `//host/x`, `#frag`). Implemented from the public spec, in
  * full: component parsing with the appendix-B regex, §5.2.2 transform
  * (strict form — a `ref` with its own scheme is taken as-is, the
  * `http:g` case), §5.2.3 path merge, §5.2.4 remove_dot_segments, §5.3
  * recomposition. No normalization beyond dot-segments — case folding
  * and default-port stripping stay in [[TextAnalysis.normalizeUrl]],
  * and the fragment is kept (the RESULT of resolution per spec; the
  * link-graph pipeline drops it in normalizeUrl). A base without a
  * scheme cannot anchor resolution and yields null, never a throw.
  *
  * The kernel is an object method (static forwarder) called from
  * whole-stage codegen, same shape as [[graft.fuzzy.Kernels]] — the
  * resolve runs inside the scan-side projection at crawl scale.
  * Golden-spec'd against the RFC's own §5.4.1 normal and §5.4.2
  * abnormal example tables (public test vectors). */
object UrlResolve {

  /** Column API: resolve `ref` against `base` (null if either is null
    * or `base` has no scheme). */
  def resolve(base: Column, ref: Column): Column =
    GraftSql.column(ResolveUrl(
      GraftSql.expression(base), GraftSql.expression(ref)))

  /** `(name, builder)` pairs for the SQL surface, consumed by
    * [[graft.GraftExtensions]]. */
  private[graft] def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] =
    Seq("resolve_url" -> (exprs => ResolveUrl(exprs(0), exprs(1))))

  // RFC 3986 appendix B: THE component-parsing regex, verbatim
  private val UriRegex = java.util.regex.Pattern.compile(
    """^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?""")

  /** Parsed components; null = undefined (distinct from empty, which
    * matters: `?` keeps an EMPTY query, no `?` means none). */
  private final class Parts(val scheme: String, val authority: String,
                            val path: String, val query: String,
                            val fragment: String)

  private def parse(u: String): Parts = {
    val m = UriRegex.matcher(u)
    m.find() // appendix-B matches any string (all parts optional)
    new Parts(m.group(2), m.group(4),
      if (m.group(5) == null) "" else m.group(5), m.group(7), m.group(9))
  }

  /** §5.2.4 remove_dot_segments. */
  private[pipeline] def removeDotSegments(p: String): String = {
    val out = new java.lang.StringBuilder(p.length)
    var in = p
    while (!in.isEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); pop(out) }
      else if (in == "/..") { in = "/"; pop(out) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.charAt(0) == '/') 1 else 0
        val idx = in.indexOf('/', start)
        if (idx < 0) { out.append(in); in = "" }
        else { out.append(in, 0, idx); in = in.substring(idx) }
      }
    }
    out.toString
  }

  // drop out's last segment AND the "/" before it (§5.2.4 step 2C)
  private def pop(out: java.lang.StringBuilder): Unit = {
    var i = out.length - 1
    while (i >= 0 && out.charAt(i) != '/') i -= 1
    out.setLength(math.max(i, 0))
  }

  /** §5.2.3 merge. */
  private def merge(base: Parts, refPath: String): String =
    if (base.authority != null && base.path.isEmpty) "/" + refPath
    else {
      val i = base.path.lastIndexOf('/')
      if (i < 0) refPath else base.path.substring(0, i + 1) + refPath
    }

  /** Codegen entry (static forwarder). Null-safe at the expression
    * layer; returns null for a scheme-less base. */
  def resolveKernel(base: UTF8String, ref: UTF8String): UTF8String = {
    val b = parse(base.toString)
    if (b.scheme == null) return null
    val r = parse(ref.toString)
    var scheme: String = null; var authority: String = null
    var path: String = null; var query: String = null
    if (r.scheme != null) {
      scheme = r.scheme; authority = r.authority
      path = removeDotSegments(r.path); query = r.query
    } else {
      scheme = b.scheme
      if (r.authority != null) {
        authority = r.authority
        path = removeDotSegments(r.path); query = r.query
      } else {
        authority = b.authority
        if (r.path.isEmpty) {
          path = b.path
          query = if (r.query != null) r.query else b.query
        } else {
          path = removeDotSegments(
            if (r.path.charAt(0) == '/') r.path else merge(b, r.path))
          query = r.query
        }
      }
    }
    // §5.3 recomposition (ref's fragment always carries through)
    val sb = new java.lang.StringBuilder(scheme.length + path.length + 16)
    sb.append(scheme).append(':')
    if (authority != null) sb.append("//").append(authority)
    sb.append(path)
    if (query != null) sb.append('?').append(query)
    if (r.fragment != null) sb.append('#').append(r.fragment)
    UTF8String.fromString(sb.toString)
  }
}

/** `resolve_url(base STRING, ref STRING) -> STRING` — see
  * [[UrlResolve]]. */
case class ResolveUrl(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
      right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) arguments, " +
          s"got (${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = StringType
  // null on a scheme-less base even with non-null inputs
  override def nullable: Boolean = true
  override def prettyName: String = "resolve_url"

  override protected def nullSafeEval(base: Any, ref: Any): Any =
    UrlResolve.resolveKernel(
      base.asInstanceOf[UTF8String], ref.asInstanceOf[UTF8String])

  // hand-rolled codegen (not defineCodeGen, which assumes a non-null
  // kernel result): the kernel itself returns null for a scheme-less base
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val baseGen = left.genCode(ctx)
    val refGen = right.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code = code"""
      ${baseGen.code}
      ${refGen.code}
      boolean ${ev.isNull} = ${baseGen.isNull} || ${refGen.isNull};
      $javaType ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
      if (!${ev.isNull}) {
        ${ev.value} = graft.pipeline.UrlResolve.resolveKernel(
          ${baseGen.value}, ${refGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
