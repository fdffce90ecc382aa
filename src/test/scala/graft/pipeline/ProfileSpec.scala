package graft.pipeline

import graft.SparkSpec
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
}
