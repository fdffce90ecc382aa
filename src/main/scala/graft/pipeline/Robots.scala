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
  * robots.txt gates millions of paths, use
  * [[Curation.robotsGate]] (built on [[rules]] + [[rulesAllowed]]):
  * it parses once per domain on the distinct-domain side and
  * broadcast-joins the pre-parsed rules back to the page stream. */
object Robots {

  /** Column API: is `path` fetchable for `agent` under `robotsTxt`?
    * Null txt = allow-all (no robots.txt served); null agent or path
    * yields null. */
  def allowed(robotsTxt: Column, agent: Column, path: Column): Column =
    GraftSql.column(RobotsAllowed(GraftSql.expression(robotsTxt),
      GraftSql.expression(agent), GraftSql.expression(path)))

  private[graft] def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "robots_allowed" ->
        (exprs => RobotsAllowed(exprs(0), exprs(1), exprs(2))),
      "robots_crawl_delay" ->
        (exprs => RobotsCrawlDelay(exprs(0), exprs(1))),
      "robots_rules" ->
        (exprs => RobotsRules(exprs(0), exprs(1))),
      "robots_rules_allowed" ->
        (exprs => RobotsRulesAllowed(exprs(0), exprs(1))))

  /** The parse-once half of the domain-granular gate
    * ([[Curation.robotsGate]]): the selected group's combined
    * `(pattern, allow)` rules for `agent`, as an
    * `ARRAY<STRUCT<pattern STRING, allow BOOLEAN>>`. Evaluate this on
    * the DISTINCT-DOMAIN side and join the rules back to the page
    * stream — parsing happens once per domain instead of once per page.
    * Null txt or agent → null (for the gate shape, a missing robots.txt
    * surfaces as a null RULES array after the left join, which
    * [[rulesAllowed]] treats as allow-all per RFC 9309 §2.3.1). */
  def rules(robotsTxt: Column, agent: Column): Column =
    GraftSql.column(RobotsRules(GraftSql.expression(robotsTxt),
      GraftSql.expression(agent)))

  /** The per-page half of the domain-granular gate: the same
    * longest-pattern / allow-on-tie walk as [[allowed]], over
    * PRE-PARSED rules — no text parse per row. Null rules = allow-all
    * (no robots.txt served for the domain); null path → null. */
  def rulesAllowed(rules: Column, path: Column): Column =
    GraftSql.column(RobotsRulesAllowed(GraftSql.expression(rules),
      GraftSql.expression(path)))

  /** Kernel for [[rules]]: parse + group-select once, emit the combined
    * rule list as Catalyst array-of-struct data. */
  def rulesKernel(txt: UTF8String, agent: UTF8String):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val rs = rulesFor(txt.toString, agent.toString)
    val rows = new Array[Any](rs.length)
    var i = 0
    while (i < rs.length) {
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(rs(i)._1), rs(i)._2)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }

  /** Kernel for [[rulesAllowed]]: the RFC 9309 §2.2.2 most-specific-
    * match walk over a pre-parsed rule array ([[rulesKernel]]'s
    * layout). `rules` may be null = allow-all. [[rulesKernel]] never
    * emits null elements or fields, but the SQL registration accepts
    * any `ARRAY<STRUCT<string, boolean>>` a user hand-builds — null
    * elements and null-fielded rules are skipped like empty-pattern
    * rules (§2.2.2 no-ops), never an executor NPE. */
  def rulesAllowedKernel(
      rules: org.apache.spark.sql.catalyst.util.ArrayData,
      path: UTF8String): Boolean = {
    if (rules == null) return true
    val p = path.toString
    var bestLen = -1
    var bestAllow = true
    var i = 0
    val n = rules.numElements()
    while (i < n) {
      val row = if (rules.isNullAt(i)) null else rules.getStruct(i, 2)
      if (row != null && !row.isNullAt(0) && !row.isNullAt(1)) {
        val pat = row.getUTF8String(0).toString
        val allow = row.getBoolean(1)
        if (pat.nonEmpty && patternMatches(pat, p)) {
          if (pat.length > bestLen || (pat.length == bestLen && allow)) {
            bestLen = pat.length
            bestAllow = allow
          }
        }
      }
      i += 1
    }
    bestAllow
  }

  /** `Sitemap:` URLs of the robots.txt, in file order (RFC 9309 §2.3 —
    * sitemaps are NOT group-scoped; they apply file-wide). Pure Column
    * chain (no kernel needed): line split, case-insensitive key match,
    * value trim. */
  def sitemaps(robotsTxt: Column): Column = {
    import org.apache.spark.sql.functions._
    transform(
      filter(split(robotsTxt, "\r?\n"),
        l => l.rlike("(?i)^\\s*sitemap\\s*:")),
      l => trim(regexp_replace(l, "(?i)^\\s*sitemap\\s*:", "")))
  }

  /** The selected group's `Crawl-delay` seconds for `agent` (a de-facto
    * extension outside RFC 9309, honored by most large crawlers), null
    * when the group declares none or the value is not a number. Group
    * selection is the same longest-prefix/`*` rule as [[allowed]]. */
  def crawlDelay(robotsTxt: Column, agent: Column): Column =
    GraftSql.column(RobotsCrawlDelay(
      GraftSql.expression(robotsTxt), GraftSql.expression(agent)))

  /** Kernel for [[crawlDelay]]: first parseable crawl-delay of the
    * selected group(s); null boxed as java.lang.Double for the
    * expression layer. */
  def crawlDelayKernel(txt: UTF8String, agent: UTF8String): java.lang.Double = {
    if (txt == null) return null
    val delays = selectGroups(parseGroups(txt.toString), agent.toString)
      .flatMap(_.delays)
    if (delays.isEmpty) null else java.lang.Double.valueOf(delays.head)
  }

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

  /** One parsed group: its user-agent values (lowercased), its
    * allow/disallow rules in order, its crawl-delays in order. */
  private final class Group(var uas: List[String]) {
    val rules = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    val delays = scala.collection.mutable.ArrayBuffer.empty[Double]
  }

  private def parseGroups(txt: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer.empty[Group]
    var current: Group = null
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
              current = new Group(Nil)
              groups += current
              collectingUas = true
            }
            current.uas = value.toLowerCase :: current.uas
          case "allow" | "disallow" if current != null =>
            collectingUas = false
            current.rules += ((value, key == "allow"))
          case "crawl-delay" if current != null =>
            collectingUas = false
            try current.delays += value.toDouble
            catch { case _: NumberFormatException => () } // unparseable: skip
          case _ =>
            // Sitemap/unknown: skipped, and per spec they do NOT end the
            // user-agent line run of a group being opened
            ()
        }
      }
    }
    groups.toSeq
  }

  /** Longest product-token prefix wins; `*` groups only if nothing
    * matches (RFC 9309 §2.2.1); all groups with the winning token
    * combine (§2.2.2). */
  private def selectGroups(groups: Seq[Group], agent: String): Seq[Group] = {
    val agentLc = agent.toLowerCase
    var bestSpecificity = -1
    groups.foreach(_.uas.foreach { ua =>
      if (ua != "*" && agentLc.startsWith(ua) && ua.length > bestSpecificity)
        bestSpecificity = ua.length
    })
    groups.filter { g =>
      if (bestSpecificity >= 0)
        g.uas.exists(ua => ua != "*" && ua.length == bestSpecificity &&
          agentLc.startsWith(ua))
      else g.uas.contains("*")
    }
  }

  /** The combined (pattern, isAllow) rules of the group(s) selected for
    * `agent`. */
  private[pipeline] def rulesFor(txt: String,
                                 agent: String): Array[(String, Boolean)] =
    selectGroups(parseGroups(txt), agent).flatMap(_.rules).toArray

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

/** `robots_crawl_delay(txt STRING, agent STRING) -> DOUBLE` — see
  * [[Robots.crawlDelay]]. Null when no delay is declared for the
  * selected group, when the txt is null, or when the agent is null. */
case class RobotsCrawlDelay(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
      right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) arguments")

  override def dataType: DataType =
    org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_crawl_delay"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val agent = right.eval(input)
    if (agent == null) null
    else Robots.crawlDelayKernel(left.eval(input).asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val txtGen = left.genCode(ctx)
    val agentGen = right.genCode(ctx)
    val boxed = ctx.freshName("delay")
    ev.copy(code = code"""
      ${agentGen.code}
      boolean ${ev.isNull} = ${agentGen.isNull};
      double ${ev.value} = -1.0;
      if (!${ev.isNull}) {
        ${txtGen.code}
        java.lang.Double $boxed = graft.pipeline.Robots.crawlDelayKernel(
          ${txtGen.isNull} ? null : ${txtGen.value}, ${agentGen.value});
        ${ev.isNull} = $boxed == null;
        if (!${ev.isNull}) { ${ev.value} = $boxed.doubleValue(); }
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
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

/** `robots_rules(txt STRING, agent STRING) ->
  * ARRAY<STRUCT<pattern STRING, allow BOOLEAN>>` — see [[Robots.rules]].
  * Standard null-in-null-out (the gate's allow-all arm lives in
  * [[RobotsRulesAllowed]]'s null-RULES handling, not here). */
case class RobotsRules(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] &&
      right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) arguments")

  override def dataType: DataType = RobotsRules.RulesType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_rules"

  override protected def nullSafeEval(txt: Any, agent: Any): Any =
    Robots.rulesKernel(txt.asInstanceOf[UTF8String],
      agent.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (txt, agent) =>
      s"graft.pipeline.Robots.rulesKernel($txt, $agent)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RobotsRules {
  /** The rule-array layout shared by [[RobotsRules]] (producer) and
    * [[RobotsRulesAllowed]] (consumer). */
  val RulesType: org.apache.spark.sql.types.ArrayType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pattern", StringType,
          nullable = false),
        org.apache.spark.sql.types.StructField("allow", BooleanType,
          nullable = false))),
      containsNull = false)
}

/** `robots_rules_allowed(rules ARRAY<STRUCT<pattern,allow>>, path STRING)
  * -> BOOLEAN` — see [[Robots.rulesAllowed]]. Asymmetric nulls
  * (hand-rolled eval/codegen like robots_allowed): null RULES = the
  * domain served no robots.txt = allow-all (RFC 9309 §2.3.1); null path
  * → null. */
case class RobotsRulesAllowed(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val rulesOk = left.dataType match {
      case org.apache.spark.sql.types.ArrayType(
        s: org.apache.spark.sql.types.StructType, _) =>
        s.length == 2 && s(0).dataType.isInstanceOf[StringType] &&
          s(1).dataType == BooleanType
      case _ => false
    }
    if (rulesOk && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<struct<pattern:string,allow:boolean>>, " +
          "string) arguments")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "robots_rules_allowed"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val path = right.eval(input)
    if (path == null) null
    else Robots.rulesAllowedKernel(
      left.eval(input)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      path.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val rulesGen = left.genCode(ctx)
    val pathGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${pathGen.code}
      boolean ${ev.isNull} = ${pathGen.isNull};
      boolean ${ev.value} = false;
      if (!${ev.isNull}) {
        ${rulesGen.code}
        ${ev.value} = graft.pipeline.Robots.rulesAllowedKernel(
          ${rulesGen.isNull} ? null : ${rulesGen.value}, ${pathGen.value});
      }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
