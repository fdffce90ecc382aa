package graft

import org.scalatest.funsuite.AnyFunSuite

/** The `spark.sql.extensions=graft.GraftExtensions` delivery path: every
  * SQL function must be available in a BRAND-NEW session (fresh
  * FunctionRegistry — temp functions registered by other suites via
  * `registerAll` do not survive `newSession()`, injected ones do). */
class GraftExtensionsSpec extends AnyFunSuite with SparkSpec {

  test("fresh session sees kernels + sketch functions without registerAll") {
    val fresh = spark.newSession()
    val row = fresh.sql(
      """SELECT levenshtein_sim('kitten', 'sitting')                  AS lev_s,
                damerau_levenshtein_dist('ca', 'abc')                 AS dam,
                indel_sim('abcde', 'ace')                             AS ind,
                ngram_jaccard_dist('abcd', 'abcd', 3)                 AS jd,
                size(minhash_signature(array('ab', 'bc'), 16))        AS k,
                fvec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F))        AS dot""").head()
    assert(math.abs(row.getAs[Double]("lev_s") - 4.0 / 7) < 1e-12)
    assert(math.abs(row.getAs[Double]("dam") - 2.0 / 3) < 1e-12)
    assert(math.abs(row.getAs[Double]("ind") - 0.75) < 1e-12)
    assert(row.getAs[Double]("jd") == 0.0)
    assert(row.getAs[Int]("k") == 16)
    assert(math.abs(row.getAs[Double]("dot") - 11.0) < 1e-12)
  }

  test("injected and registerAll surfaces are identical") {
    val injected = GraftExtensions.builders.map(_._1).toSet
    val imperative =
      (graft.fuzzy.functions.sqlBuilders ++
        graft.fuzzy.vectorFunctions.sqlBuilders).map(_._1).toSet
    assert(injected == imperative)
    assert(injected.size ==
      GraftExtensions.builders.size, "duplicate function names in the surface")
  }
}
