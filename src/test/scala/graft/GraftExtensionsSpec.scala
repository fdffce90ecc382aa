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

  test("every builder-listed function resolves in a fresh session") {
    val names = GraftExtensions.builders.map(_._1)
    assert(names.size == names.toSet.size, "duplicate function names in the surface")
    assert(names.size >= 20, s"suspiciously small SQL surface: $names")
    val fresh = spark.newSession()
    val missing = names.filterNot(n => fresh.catalog.functionExists(n))
    assert(missing.isEmpty, s"functions not injected into a fresh session: $missing")
  }
}
