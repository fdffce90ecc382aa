package graft.plans

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rule must (a) fire on SQL threshold predicates in every
  * supported comparison shape, (b) never change results, and (c) leave
  * bare distances in projections untouched (the bounded kernel's 2.0
  * out-of-band value must never become observable).
  *
  * The fixture reads PARQUET (not a local Seq): a LocalRelation source
  * gets folded away by ConvertToLocalRelation before the plan can be
  * inspected. */
class BoundedDistanceRewriteSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val view: String = {
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .createOrReplaceTempView("cust_v")
    "(SELECT a.c_name AS a, b.c_name AS b FROM cust_v a CROSS JOIN cust_v b)"
  }

  private def optimizedPlan(sql: String): String =
    spark.sql(sql).queryExecution.optimizedPlan.toString

  test("threshold predicates rewrite to the bounded kernel (all shapes)") {
    val shapes = Seq(
      s"SELECT * FROM $view WHERE levenshtein_dist(a, b) <= 0.3",
      s"SELECT * FROM $view WHERE levenshtein_dist(a, b) < 0.3",
      s"SELECT * FROM $view WHERE 0.3 >= levenshtein_dist(a, b)",
      s"SELECT * FROM $view WHERE 0.3 > levenshtein_dist(a, b)",
      s"SELECT * FROM $view WHERE 1.0 - levenshtein_dist(a, b) >= 0.7")
    shapes.foreach { q =>
      val plan = optimizedPlan(q)
      assert(plan.contains("levenshtein_dist_bounded"),
        s"rule did not fire for:\n$q\n$plan")
    }
  }

  test("rewritten queries return exactly the plain-kernel rows") {
    val bounded = spark.sql(
      s"SELECT a, b FROM $view WHERE damerau_levenshtein_dist(a, b) <= 0.4")
      .as[(String, String)].collect().toSet
    // reference WITHOUT the rule: the plain expression projected as a
    // VALUE (projections are never rewritten), filtered in Scala
    val plain = spark.sql(
        s"SELECT a, b, damerau_levenshtein_dist(a, b) AS d FROM $view")
      .as[(String, String, Double)].collect()
      .filter(_._3 <= 0.4).map(t => (t._1, t._2)).toSet
    assert(bounded == plain)
    assert(bounded.nonEmpty, "fixture produced no matching pairs")
  }

  test("bare distances in projections are not rewritten") {
    val plan = optimizedPlan(s"SELECT levenshtein_dist(a, b) AS d FROM $view")
    assert(!plan.contains("levenshtein_dist_bounded"),
      s"projection value must keep the exact kernel:\n$plan")
    // and the projected values really are exact (none of the 2.0 sentinel)
    val far = spark.sql(
      s"SELECT max(levenshtein_dist(a, b)) FROM $view").as[Double].head()
    assert(far <= 1.0, s"observable 2.0 sentinel leaked: $far")
  }
}
