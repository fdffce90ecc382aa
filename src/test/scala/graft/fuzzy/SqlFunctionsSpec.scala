package graft.fuzzy

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The similarity kernels registered as SQL functions: every exact-path
  * fuzzy predicate is expressible in plain `spark.sql`. */
class SqlFunctionsSpec extends AnyFunSuite with SparkSpec {

  test("all twelve <algo>_dist / <algo>_sim functions usable from SQL") {
    functions.registerAll(spark)
    val row = spark.sql(
      """SELECT levenshtein_dist('kitten', 'sitting')   AS lev_d,
                levenshtein_sim('kitten', 'sitting')    AS lev_s,
                jaro_winkler_sim('apple inc.', 'apple incorporated') AS jw,
                damerau_levenshtein_dist('ca', 'abc')   AS dam,
                hamming_dist('karolin', 'kathrin')      AS ham,
                indel_dist('abcde', 'ace')              AS ind,
                jaro_sim('john', 'johny')               AS jar""").head()
    assert(math.abs(row.getAs[Double]("lev_d") - 3.0 / 7) < 1e-12)
    assert(math.abs(row.getAs[Double]("lev_s") - 4.0 / 7) < 1e-12)
    assert(math.abs(row.getAs[Double]("jw") - 0.88) < 1e-12)
    assert(math.abs(row.getAs[Double]("dam") - 2.0 / 3) < 1e-12)
    assert(math.abs(row.getAs[Double]("ham") - 3.0 / 7) < 1e-12)
    assert(math.abs(row.getAs[Double]("ind") - 0.25) < 1e-12)
    assert(math.abs(row.getAs[Double]("jar") - 0.9333333333333332) < 1e-10)
  }

  test("sketch/vector functions usable from SQL") {
    vectorFunctions.registerAll(spark)
    val row = spark.sql(
      """SELECT fvec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F))        AS cos_same,
                fvec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F))           AS dot,
                sig_agreement(array(1L, 2L, 3L, 4L), array(1L, 9L, 3L, 8L)) AS agree,
                size(minhash_signature(array('ab', 'bc'), 16))           AS sig_len,
                simhash64(array('a', 'b')) = simhash64(array('a', 'b'))  AS sh_det,
                size(char_ngrams('abcd', 3))                             AS n_grams,
                ngram_jaccard_dist('abcd', 'abcd', 3)                    AS jd_same,
                size(winnow_sketch('hello world hello', 5, 4))           AS wn""").head()
    assert(row.getAs[Double]("cos_same") == 1.0)
    assert(row.getAs[Double]("dot") == 11.0)
    assert(row.getAs[Double]("agree") == 0.5)
    assert(row.getAs[Int]("sig_len") == 16)
    assert(row.getAs[Boolean]("sh_det"))
    assert(row.getAs[Int]("n_grams") == 2)
    assert(row.getAs[Double]("jd_same") == 0.0)
    assert(row.getAs[Int]("wn") > 0)
  }

  test("fuzzy join expressible in one SQL statement") {
    functions.registerAll(spark)
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet").createOrReplaceTempView("cust")
    spark.read.parquet("/root/testdata/sf0.001/supplier.parquet").createOrReplaceTempView("supp")
    val n = spark.sql(
      """SELECT c_custkey, s_suppkey,
                levenshtein_sim(lower(c_name), lower(s_name)) AS score
         FROM cust CROSS JOIN supp
         WHERE levenshtein_dist(lower(c_name), lower(s_name)) <= 0.3""").count()
    assert(n == 10)
  }
}
