package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Some(1L), Some("a"), Some(2.5)),
    (Some(2L), Some("b"), None),
    (Some(2L), None, Some(-1.0)),
    (Some(3L), Some("a"), Some(2.5)),
    (None, None, None)
  ).toDF("id", "s", "x")

  private def byCol(out: org.apache.spark.sql.DataFrame) =
    out.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap

  test("correlations: exact-sum Pearson with sentinel on zero variance") {
    val d = (1 to 100).map(i => (i.toDouble, 2.0 * i, 101.0 - i, 7.0))
      .toDF("x", "y", "z", "c")
    val m = Profile.correlations(d, Seq("x", "y", "z", "c"), scale = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(m.size == 6)
    assert(m(("x", "y")) == ((100L, 1.0)))    // perfectly correlated
    assert(m(("x", "z")) == ((100L, -1.0)))   // perfectly anti-correlated
    assert(m(("x", "c")) == ((100L, 0.0)))    // constant column -> sentinel
    assert(m(("y", "z"))._2 == -1.0)
    // null rows excluded listwise
    val withNull = d.unionByName(Seq((Double.NaN, 1.0, 1.0, 7.0)).toDF("x", "y", "z", "c")
      .select(org.apache.spark.sql.functions.lit(null).cast("double").as("x"),
        org.apache.spark.sql.functions.col("y"),
        org.apache.spark.sql.functions.col("z"),
        org.apache.spark.sql.functions.col("c")))
    val m2 = Profile.correlations(withNull, Seq("x", "y"), scale = 1L)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).head
    assert(m2 == ((100L, 1.0)))
  }

  test("exact profile: counts, nulls, distinct, min/max per column in one frame") {
    val m = byCol(Profile.columns(df, Seq("id", "s", "x")))
    assert(m("id") === ((5L, 1L, 3L, "1", "3")))
    assert(m("s") === ((5L, 2L, 2L, "a", "b")))
    assert(m("x") === ((5L, 2L, 2L, "-1.0", "2.5")))
  }

  test("all-null column profiles with '' min/max sentinels, zero distinct") {
    val m = byCol(Profile.columns(
      Seq((1L, Option.empty[String]), (2L, None)).toDF("k", "v"), Seq("v")))
    assert(m("v") === ((2L, 2L, 0L, "", "")))
  }

  test("approx profile matches exact on everything but n_distinct, which lands within rsd") {
    val exact = byCol(Profile.columns(df, Seq("id", "s")))
    val approx = byCol(Profile.columnsApprox(df, Seq("id", "s"), rsd = 0.05))
    for (c <- Seq("id", "s")) {
      val (en, enl, end, emin, emax) = exact(c)
      val (an, anl, and, amin, amax) = approx(c)
      assert((an, anl, amin, amax) === ((en, enl, emin, emax)), c)
      assert(math.abs(and - end) <= math.max(1L, (end * 0.1).toLong), c)
    }
  }

  test("heavy hitters: top-k per column, deterministic ties, nulls excluded") {
    val d = Seq(
      ("a", Some("x")), ("a", Some("x")), ("a", Some("y")),
      ("b", Some("y")), ("b", None), ("c", Some("y"))
    ).toDF("g", "v")
    val out = Profile.heavyHitters(d, Seq("g", "v"), k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // g: a=3, b=2 (c=1 cut); v: y=3, x=2; the null v row never appears
    assert(out === Set(("g", "a", 3L), ("g", "b", 2L),
      ("v", "y", 3L), ("v", "x", 2L)))
  }

  test("heavy hitters: equal counts cut by value ascending (deterministic top-k)") {
    val d = Seq("z", "w", "z", "w", "q", "q").toDF("v")
    val out = Profile.heavyHitters(d, Seq("v"), k = 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(out === Set(("q", 2L), ("w", 2L))) // z loses the 3-way tie
  }

  test("missing column and empty column list are rejected") {
    intercept[IllegalArgumentException](Profile.columns(df, Seq("nope")))
    intercept[IllegalArgumentException](Profile.columns(df, Seq.empty))
  }

  test("exact quantiles: golden interpolated values on a known frame") {
    // values 10, 20, 30, 40 (n=4): q(p) = value at index p*(n-1), linear
    // between neighbors — p=0.5 -> 25.0, p=0.25 -> 17.5, p=0.99 -> 39.7
    val d = Seq(10L, 30L, 20L, 40L).toDF("v")
    val q = Profile.numericQuantiles(d, Seq("v"), Seq(0.0, 0.25, 0.5, 0.99, 1.0))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(q(0.0) === 10.0)
    assert(q(0.25) === 17.5)
    assert(q(0.5) === 25.0)
    assert(math.abs(q(0.99) - 39.7) < 1e-9)
    assert(q(1.0) === 40.0)
  }

  test("quantiles: multi-column single-aggregate layout and null handling") {
    val d = Seq((1L, Some(100L)), (2L, None), (3L, Some(200L)))
      .toDF("a", "b")
    val out = Profile.numericQuantiles(d, Seq("a", "b"), Seq(0.5))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSet
    // b's null is ignored: median of (100, 200) = 150
    assert(out === Set(("a", 0.5, 2.0), ("b", 0.5, 150.0)))
  }

  test("approx quantiles track exact within the sketch accuracy") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val probs = Seq(0.25, 0.5, 0.9)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val exact = toMap(Profile.numericQuantiles(docs, Seq("n_chars"), probs))
    val approx = toMap(Profile.numericQuantilesApprox(docs, Seq("n_chars"), probs))
    for ((k, v) <- exact) {
      val rel = math.abs(approx(k) - v) / math.max(v, 1.0)
      assert(rel < 0.05, s"$k: approx ${approx(k)} vs exact $v")
    }
  }

  test("quantiles reject bad probabilities and missing columns") {
    intercept[IllegalArgumentException](
      Profile.numericQuantiles(df, Seq("id"), Seq(1.5)))
    intercept[IllegalArgumentException](
      Profile.numericQuantiles(df, Seq("nope"), Seq(0.5)))
    intercept[IllegalArgumentException](
      Profile.numericQuantiles(df, Seq("id"), Seq.empty))
  }

  test("exact plan uses one aggregate pass (Expand multi-distinct), approx has no Expand") {
    val dir = java.nio.file.Files.createTempDirectory("prof").toString
    df.write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val exactPlan = Profile.columns(src, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    val approxPlan = Profile.columnsApprox(src, Seq("id", "s"))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), exactPlan)
    assert(!approxPlan.contains("Expand"), approxPlan)
    // one scan each — a per-column loop would show the parquet path k times
    for (p <- Seq(exactPlan, approxPlan))
      assert(p.sliding("Scan parquet".length).count(_ == "Scan parquet") <= 1, p)
  }

  test("expectations: each check counts its own violations, one scan for the suite") {
    import spark.implicits._
    import Profile._
    val frame = Seq[(java.lang.Long, String, String)](
      (1L, "aa", "x"), (2L, "bb", null), (2L, "cc", "y"),
      (3L, "dd", "zzz"), (null, "ee", "x"))
      .toDF("id", "code", "val")
    val got = expectations(frame, Seq(
      ExpectNotNull("id"),          // 1 null
      ExpectNotNull("code"),        // 0
      ExpectUnique("id"),           // 4 non-null, 3 distinct -> 1
      ExpectValuesIn("val", Seq("x", "y")), // "zzz" -> 1 (null ignored)
      ExpectMinGe("id", 2L),        // id 1 -> 1
      ExpectMaxLe("id", 2L),        // id 3 -> 1
      ExpectRowCount(10L, 20L),     // 5 rows -> distance 5
      ExpectRegex("code", "^[a-z]{2}$"))) // all match -> 0
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(("not_null", "id")) == ((0L, 1L)))
    assert(got(("not_null", "code")) == ((1L, 0L)))
    assert(got(("unique", "id")) == ((0L, 1L)))
    assert(got(("values_in", "val")) == ((0L, 1L)))
    assert(got(("min_ge", "id")) == ((0L, 1L)))
    assert(got(("max_le", "id")) == ((0L, 1L)))
    assert(got(("row_count", "")) == ((0L, 5L)))
    assert(got(("regex", "code")) == ((1L, 0L)))

    // suite cost = ONE scan regardless of check count
    val dir = java.nio.file.Files.createTempDirectory("expect").toString
    frame.write.mode("overwrite").parquet(dir)
    val plan = expectations(spark.read.parquet(dir), Seq(
      ExpectNotNull("id"), ExpectRegex("code", "^[a-z]+$"),
      ExpectRowCount(1L, 100L))).queryExecution.executedPlan.toString
    assert(plan.sliding("Scan parquet".length).count(_ == "Scan parquet") == 1, plan)
  }

  test("evalRanking: recall and MRR from hand-built rankings, zero-hit query kept") {
    import spark.implicits._
    val truth = Seq(
      (1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1), (3L, 31L, 2)).toDF("query_id", "corpus_id", "rank")
    val result = Seq(
      (1L, 10L, 1), (1L, 11L, 2),   // both found, best rank 1
      (2L, 99L, 1), (2L, 21L, 2),   // one found at rank 2
      (3L, 98L, 1), (3L, 97L, 2)).toDF("query_id", "corpus_id", "rank") // none
    val got = AnnSearch.evalRanking(result, truth, 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 1.0, 1.0)))
    assert(got(2L) == ((1L, 0.5, 0.5)))
    assert(got(3L) == ((0L, 0.0, 0.0)))
  }

  test("psi: zero on identical distributions, every term non-negative, big on a real shift") {
    import spark.implicits._
    val a = (Seq.fill(50)("en") ++ Seq.fill(30)("de") ++ Seq.fill(20)("fr"))
      .zipWithIndex.map(_.swap).toDF("id", "lang")
    // identical distribution (itself): every contribution is EXACTLY 0
    assert(Profile.psiCategorical(a, a, "lang")
      .where(col("psi_contrib") =!= 0.0).count() === 0L)
    // PSI terms are non-negative by construction: sign(pn-po) == sign(ln(pn/po))
    val b = (Seq.fill(10)("en") ++ Seq.fill(30)("de") ++ Seq.fill(60)("zh"))
      .zipWithIndex.map(_.swap).toDF("id", "lang")
    val drift = Profile.psiCategorical(a, b, "lang").collect()
    assert(drift.forall(_.getAs[Double]("psi_contrib") >= 0.0))
    // a wholesale language swap is far past the 0.25 "shifted" bar
    assert(drift.map(_.getAs[Double]("psi_contrib")).sum > 0.25)
    // union key set: zh (new-only) and fr (old-only) both get rows
    assert(drift.map(_.getAs[String]("lang")).toSet === Set("en", "de", "fr", "zh"))
  }

  test("madOutliers: robust to the very outlier a mean/stddev rule drowns in") {
    import spark.implicits._
    // group a: nine values near 10 and one wild 1e6 — the wild value is
    // the ONLY outlier under median/MAD (a z-score rule would let it
    // drag the threshold up and flag nothing); group b is constant with
    // one deviant: mad=0 flags any deviation
    val df = ((1 to 9).map(i => ("a", 100L + i, 8L + (i % 5))).toSeq ++
      Seq(("a", 110L, 1000000L)) ++
      (1 to 4).map(i => ("b", 200L + i, 7L)) ++ Seq(("b", 205L, 8L)))
      .toDF("g", "id", "v")
    val out = Profile.madOutliers(df, "g", "v", k = 3.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_outlier")).toMap
    assert(out(110L) === true)
    assert((101L to 109L).forall(i => !out(i)))
    assert(out(205L) === true && (201L to 204L).forall(i => !out(i)))
    // null group is its own group, not dropped
    val withNull = Seq((null.asInstanceOf[String], 1L, 5L),
      (null.asInstanceOf[String], 2L, 5L)).toDF("g", "id", "v")
    assert(Profile.madOutliers(withNull, "g", "v").count() === 2L)
  }
}
