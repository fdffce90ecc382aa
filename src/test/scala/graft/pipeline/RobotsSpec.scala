package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Robots]] against RFC 9309's rules: group selection (longest
  * product-token prefix, `*` fallback, same-token merge), rule
  * precedence (longest pattern, tie → allow), wildcard/anchor patterns,
  * empty-rule no-ops, and the expression/SQL layer. */
class RobotsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Txt =
    """# a comment line
      |User-agent: GraftBot-News
      |Disallow: /news-private/
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /private/
      |Allow: /private/ok
      |Disallow: *.gif$
      |Allow: /p
      |Disallow: /p
      |Disallow:
      |
      |User-agent: *
      |Disallow: /all/
      |""".stripMargin

  private def ok(agent: String, path: String, txt: String = Txt) =
    Robots.isAllowedStr(txt, agent, path)

  test("group selection: longest product-token prefix wins; the * group " +
    "is ignored once a specific group matches") {
    // GraftBot matches 'graftbot' (prefix, case-insensitive), NOT the
    // longer 'graftbot-news' (not a prefix of this token)
    assert(!ok("GraftBot", "/private/x"))
    assert(ok("GraftBot", "/private/ok/y")) // longer Allow wins
    assert(ok("GraftBot", "/all/x")) // * group not consulted
    // the news crawler selects ONLY its most specific group
    assert(!ok("GraftBot-News", "/news-private/x"))
    assert(ok("GraftBot-News", "/private/x"))
    // unknown crawler falls back to *
    assert(!ok("randombot", "/all/x"))
    assert(ok("randombot", "/private/x"))
    // a listed sibling token shares the group
    assert(!ok("OtherBot", "/private/x"))
  }

  test("rule precedence: longest pattern wins, tie goes to allow, empty " +
    "patterns are no-ops") {
    assert(ok("graftbot", "/p")) // Allow:/p vs Disallow:/p tie -> allow
    assert(ok("graftbot", "/q")) // empty Disallow: is not 'disallow all'
  }

  test("patterns: * spans any run, $ anchors the end, prefix otherwise") {
    assert(!ok("graftbot", "/img/cat.gif"))
    assert(ok("graftbot", "/img/cat.gif?cached=1")) // $ anchor: no match
    assert(!ok("graftbot", "/a/b/deep.gif"))
    val t2 = "User-agent: *\nDisallow: /exact$\nDisallow: /pre*fix\n"
    assert(!ok("any", "/exact", t2))
    assert(ok("any", "/exactly", t2)) // anchored: only the exact path
    assert(!ok("any", "/pre/mid/fix-and-more", t2)) // * spans, then prefix
    assert(ok("any", "/prefi", t2)) // the 'fix' segment never completes
  }

  test("same-token groups merge; no robots.txt or no match means allowed") {
    val merged = "User-agent: bot\nDisallow: /a/\n\n" +
      "User-agent: bot\nDisallow: /b/\n"
    assert(!ok("bot", "/a/x", merged) && !ok("bot", "/b/x", merged))
    assert(ok("bot", "/c/x", merged))
    assert(Robots.isAllowed(null, // no robots.txt served -> allow-all
      org.apache.spark.unsafe.types.UTF8String.fromString("bot"),
      org.apache.spark.unsafe.types.UTF8String.fromString("/anything")))
  }

  test("sitemaps are file-wide; crawl-delay is group-scoped with " +
    "longest-prefix selection, unparseable values skipped") {
    val t = "Sitemap: https://a/s1.xml\nUser-agent: graftbot\n" +
      "Crawl-delay: 2.5\nDisallow: /x\nSitemap: https://a/s2.xml\n\n" +
      "User-agent: *\nCrawl-delay: oops\nDisallow: /y\n"
    val row = Seq(t).toDF("txt").select(
      Robots.sitemaps(col("txt")).as("sm"),
      Robots.crawlDelay(col("txt"), lit("GraftBot-Images")).as("d1"),
      Robots.crawlDelay(col("txt"), lit("randombot")).as("d2"),
      Robots.crawlDelay(lit(null).cast("string"), lit("x")).as("d3"))
      .collect().head
    assert(row.getSeq[String](0) == Seq("https://a/s1.xml", "https://a/s2.xml"))
    assert(row.getDouble(1) == 2.5) // prefix-selected graftbot group
    assert(row.isNullAt(2)) // * group's delay is unparseable -> none
    assert(row.isNullAt(3)) // no robots.txt -> no delay
  }

  test("expression layer: null txt allows, null agent/path null; " +
    "DataFrame codegen and SQL registration agree") {
    val rows = Seq(
      (0L, Txt, "graftbot", "/private/x"),
      (1L, null, "bot", "/x"),
      (2L, Txt, null, "/x"),
      (3L, Txt, "graftbot", null))
      .toDF("id", "txt", "agent", "path")
    val df = rows.select(col("id"),
        Robots.allowed(col("txt"), col("agent"), col("path")).as("a"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    assert(df == Map(0L -> Some(false), 1L -> Some(true), 2L -> None, 3L -> None))
    rows.createOrReplaceTempView("robots_spec")
    val sql = spark.sql(
      "SELECT id, robots_allowed(txt, agent, path) AS a FROM robots_spec")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    assert(sql == df)
  }

  test("robots_rules + robots_rules_allowed: the parse-once halves compose " +
    "to the same verdicts as robots_allowed, from Scala and SQL; a null " +
    "rule array allows, a null path is null") {
    val rows = Seq(
      (0L, Txt, "/private/x"), (1L, Txt, "/private/ok2"),
      (2L, Txt, "/all/y"), (3L, Txt, "/img.gif"), (4L, Txt, "/p"),
      (5L, null, "/anything"), (6L, Txt, null))
      .toDF("id", "txt", "path")
    val composed = rows.select(col("id"),
        Robots.rulesAllowed(
          when(col("txt").isNotNull, Robots.rules(col("txt"), lit("graftbot"))),
          col("path")).as("a"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    val reference = rows.select(col("id"),
        Robots.allowed(col("txt"), lit("graftbot"), col("path")).as("a"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    assert(composed == reference, s"composed $composed != $reference")
    rows.createOrReplaceTempView("robots_rules_spec")
    val sql = spark.sql(
      """SELECT id, robots_rules_allowed(
           CASE WHEN txt IS NOT NULL THEN robots_rules(txt, 'graftbot') END,
           path) AS a FROM robots_rules_spec""")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    assert(sql == composed)
  }

  test("robots_rules_allowed: hand-built arrays with null elements or " +
    "null fields skip them as rule no-ops — never an executor NPE") {
    val got = spark.sql(
      """SELECT robots_rules_allowed(array(
           named_struct('pattern', CAST(NULL AS STRING), 'allow', true),
           CAST(NULL AS STRUCT<pattern: STRING, allow: BOOLEAN>),
           named_struct('pattern', '/x', 'allow', false),
           named_struct('pattern', '/x/ok', 'allow',
             CAST(NULL AS BOOLEAN))), '/x/ok') AS a""").collect()
    // the null-fielded rules are no-ops; the one valid rule disallows
    assert(got.length == 1 && !got(0).getBoolean(0))
  }

  test("robotsGate: domain-granular verdicts are IDENTICAL to the per-row " +
    "expression over a many-paths-per-domain frame; domains with no " +
    "robots row allow everything") {
    val rnd = new scala.util.Random(42)
    val txts = Array(Txt,
      "User-agent: *\nDisallow: /\nAllow: /pub",
      "User-agent: graftbot\nDisallow: *.bin$\nAllow: /a*z\nDisallow: /a/",
      "User-agent: other\nDisallow: /x")
    val domains = (0 until 12).map(d => s"d$d.example")
    // d10/d11 serve no robots.txt; three duplicate fetches per domain
    // exercise the gate's dedup
    val robots = domains.take(10).flatMap { d =>
      Seq.fill(3)((d, txts(math.abs(d.hashCode) % txts.length)))
    }.toDF("domain", "robots_txt")
    val paths = Seq("/private/x", "/private/ok/y", "/a/middle/z", "/pub/1",
      "/img.bin", "/img.gif", "/x", "/", "/news-private/a", "/all/b")
    val pages = (0 until 2000).map { i =>
      (i.toLong, domains(rnd.nextInt(domains.length)),
        paths(rnd.nextInt(paths.length)))
    }.toDF("id", "domain", "path")
    val gate = Curation.robotsGate(pages, robots, "graftbot")
      .select(col("id"), col("allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val perRow = pages
      .join(broadcast(robots.dropDuplicates("domain")), Seq("domain"), "left")
      .select(col("id"),
        Robots.allowed(col("robots_txt"), lit("graftbot"), col("path"))
          .as("allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(gate.size == 2000 && gate == perRow)
    // both verdict polarities actually occur
    assert(gate.values.exists(identity) && gate.values.exists(!_))
    // the past-broadcast-size arm: a domain-keyed shuffle join, same
    // verdicts bit-for-bit
    val shuffled = Curation.robotsGate(pages, robots, "graftbot",
        broadcastRobots = false)
      .select(col("id"), col("allowed"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(shuffled == gate)
  }
}
