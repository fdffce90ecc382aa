package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt compliance gate (RFC 9309) — `robots_allowed(txt, agent,
  * path)` — the filter every responsible crawl-derived corpus applies
  * before keeping a page. Implemented from the public spec:
  *
  *  - GROUP SELECTION (§2.2.1): lines are grouped under their
  *    `User-agent` lines; the crawler's group is the one whose agent
  *    value is the LONGEST case-insensitive prefix of the crawler's
  *    product token, with `*` groups as the fallback; all groups with
  *    the winning token combine (§2.2.2's merge rule).
  *  - RULE MATCHING (§2.2.2): among the selected group's
  *    `Allow`/`Disallow` rules whose path pattern matches, the MOST
  *    SPECIFIC (longest pattern) wins; on a tie, allow wins. No group
  *    or no matching rule means allowed. Empty-pattern rules are
  *    no-ops (`Disallow:` with nothing = allow all, the classic form).
  *  - PATTERNS (§2.2.3): prefix match with `*` (any character run)
  *    and `$` (end anchor) — matched with an ordered-segments walk,
  *    no regex compilation per row.
  *
  * Unknown lines (Sitemap, Crawl-delay, comments) are skipped per
  * spec. A null robots.txt means "no robots.txt was served", which
  * RFC 9309 §2.3.1 treats as allow-all. Percent-encoding equivalence
  * is NOT normalized (both sides are compared as served) — documented
  * simplification; feed consistently-encoded paths.
  *
  * The kernel is an object method (static forwarder) callable from
  * whole-stage codegen. Parsing happens per evaluation — right for the
  * gate-per-(page,robots) projection shape; when one domain's
  * robots.txt gates millions of paths, parse once per domain on the
  * distinct-domain side and broadcast-join the verdicts back instead. */
object Robots {

  /** Column API: is `path` fetchable for `agent` under `robotsTxt`?
    * Null txt = allow-all (no robots.txt served); null agent or path
    * yields null. */
  def allowed(robotsTxt: Column, agent: Column, path: Column): Column =
    GraftSql.column(RobotsAllowed(GraftSql.expression(robotsTxt),
      GraftSql.expression(agent), GraftSql.expression(path)))

  private[graft] def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] =
    Seq("robots_allowed" ->
      (exprs => RobotsAllowed(exprs(0), exprs(1), exprs(2))))

  /** Codegen entry (static forwarder). `txt` may be null (allow-all). */
  def isAllowed(txt: UTF8String, agent: UTF8String, path: UTF8String): Boolean = {
    if (txt == null) return true
    isAllowedStr(txt.toString, agent.toString, path.toString)
  }

  private[pipeline] def isAllowedStr(txt: String, agent: String,
                                     path: String): Boolean = {
    val rules = rulesFor(txt, agent)
    // most specific match wins; tie -> allow (RFC 9309 §2.2.2)
    var bestLen = -1
    var bestAllow = true
    var i = 0
    while (i < rules.length) {
      val (pat, allow) = rules(i)
      if (pat.nonEmpty && patternMatches(pat, path)) {
        if (pat.length > bestLen || (pat.length == bestLen && allow)) {
          bestLen = pat.length
          bestAllow = allow
        }
      }
      i += 1
    }
    bestAllow
  }

  /** The combined (pattern, isAllow) rules of the group(s) selected for
    * `agent`: longest-prefix product-token match, `*` fallback. */
  private[pipeline] def rulesFor(txt: String,
                                 agent: String): Array[(String, Boolean)] = {
    val agentLc = agent.toLowerCase
    // one pass: collect (uaValuesOfGroup, rules) per group
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(List[String], scala.collection.mutable.ArrayBuffer[(String, Boolean)])]
    var currentUas: List[String] = Nil
    var currentRules: scala.collection.mutable.ArrayBuffer[(String, Boolean)] = null
    var collectingUas = false
    txt.split("\r?\n", -1).foreach { raw =>
      val noComment = { val h = raw.indexOf('#'); if (h >= 0) raw.substring(0, h) else raw }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!collectingUas) { // a new group starts
              currentUas = Nil
              currentRules = scala.collection.mutable.ArrayBuffer.empty
              groups += ((Nil, currentRules)) // uas patched when the run ends
              collectingUas = true
            }
            currentUas = value.toLowerCase :: currentUas
            groups(groups.length - 1) = ((currentUas, currentRules))
          case "allow" | "disallow" if currentRules != null =>
            collectingUas = false
            currentRules += ((value, key == "allow"))
          case _ =>
            // Sitemap/Crawl-delay/unknown: skipped, and per spec they do
            // NOT end the user-agent line run of a group being opened
            ()
        }
      }
    }
    // longest product-token prefix wins; '*' only if nothing matches
    var bestSpecificity = -1
    groups.foreach { case (uas, _) =>
      uas.foreach { ua =>
        if (ua != "*" && agentLc.startsWith(ua) && ua.length > bestSpecificity)
          bestSpecificity = ua.length
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    groups.foreach { case (uas, rules) =>
      val selected =
        if (bestSpecificity >= 0)
          uas.exists(ua => ua != "*" && ua.length == bestSpecificity &&
            agentLc.startsWith(ua))
        else uas.contains("*")
      if (selected) out ++= rules
    }
    out.toArray
  }

  /** §2.2.3 path pattern: ordered `*`-separated segments, first anchored
    * at the path start, optional trailing `$` end anchor. */
  private[pipeline] def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    val segs = p.split("\\*", -1)
    if (!path.startsWith(segs(0))) return false
    var pos = segs(0).length
    var i = 1
    while (i < segs.length) {
      if (i == segs.length - 1 && anchored)
        return path.endsWith(segs(i)) && path.length - segs(i).length >= pos
      val idx = path.indexOf(segs(i), pos)
      if (idx < 0) return false
      pos = idx + segs(i).length
      i += 1
    }
    if (anchored) pos == path.length else true
  }
}

/** `robots_allowed(txt STRING, agent STRING, path STRING) -> BOOLEAN` —
  * see [[Robots]]. Null txt = allow-all (hand-rolled eval/codegen, same
  * asymmetric-null shape as http_text); null agent/path = null. */
case class RobotsAllowed(first: Expression, second: Expression,
                         third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[StringType]))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string, string) arguments")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_allowed"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val agent = second.eval(input)
    val path = third.eval(input)
    if (agent == null || path == null) null
    else Robots.isAllowed(first.eval(input).asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String], path.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val txtGen = first.genCode(ctx)
    val agentGen = second.genCode(ctx)
    val pathGen = third.genCode(ctx)
    ev.copy(code = code"""
      ${agentGen.code}
      ${pathGen.code}
      boolean ${ev.isNull} = ${agentGen.isNull} || ${pathGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${txtGen.code}
        ${ev.value} = graft.pipeline.Robots.isAllowed(
          ${txtGen.isNull} ? null : ${txtGen.value},
          ${agentGen.value}, ${pathGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
