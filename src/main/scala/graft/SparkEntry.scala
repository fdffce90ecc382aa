package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, round => sround}

import graft.fuzzy.{FuzzyAlgorithm, FuzzyMapping, FuzzyMatcher, MatchOptions}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here must be mirrored by an `oracleSql` entry (same column
  * names, same rounding) unless the operator is not SQL-expressible in
  * DuckDB, in which case it gets a rows-only check.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  import FuzzyAlgorithm._

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full fuzzy join customer x supplier on name, levenshtein@70. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    FuzzyMatcher.matchDfs(
      t(spark, dir, "customer"), t(spark, dir, "supplier"),
      Seq(FuzzyMapping("c_name", "s_name", thresholdScore = 70.0, fuzzyType = Levenshtein)))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- fuzzy join, one mapping per algorithm (exact path, oracle-checked)
    "fuzzy_join_levenshtein" -> ((s, dir) => {
      val res = FuzzyMatcher.matchDfs(
        t(s, dir, "customer"), t(s, dir, "supplier"),
        Seq(FuzzyMapping("c_name", "s_name", 70.0, Levenshtein)))
      res.select(col("c_custkey"), col("s_suppkey"),
        sround(col("c_name_vs_s_name_levenshtein"), 6).as("score"))
    }),
    "fuzzy_join_damerau" -> ((s, dir) => {
      val res = FuzzyMatcher.matchDfs(
        t(s, dir, "customer"), t(s, dir, "supplier"),
        Seq(FuzzyMapping("c_name", "s_name", 70.0, DamerauLevenshtein)))
      res.select(col("c_custkey"), col("s_suppkey"),
        sround(col("c_name_vs_s_name_damerau_levenshtein"), 6).as("score"))
    }),
    "fuzzy_join_jaro" -> ((s, dir) => {
      val res = FuzzyMatcher.matchDfs(
        t(s, dir, "customer"), t(s, dir, "supplier"),
        Seq(FuzzyMapping("c_name", "s_name", 80.0, Jaro)))
      res.select(col("c_custkey"), col("s_suppkey"),
        sround(col("c_name_vs_s_name_jaro"), 6).as("score"))
    }),
    "fuzzy_join_jaro_winkler" -> ((s, dir) => {
      val res = FuzzyMatcher.matchDfs(
        t(s, dir, "customer"), t(s, dir, "customer"),
        Seq(FuzzyMapping("c_name", "c_name", 90.0, JaroWinkler)))
      res.select(col("c_custkey"), col("c_custkey_right"),
        sround(col("c_name_vs_c_name_right_jaro_winkler"), 6).as("score"))
    }),
    "fuzzy_join_hamming" -> ((s, dir) => {
      val res = FuzzyMatcher.matchDfs(
        t(s, dir, "customer"), t(s, dir, "customer"),
        Seq(FuzzyMapping("c_name", "c_name", 80.0, Hamming)))
      res.select(col("c_custkey"), col("c_custkey_right"),
        sround(col("c_name_vs_c_name_right_hamming"), 6).as("score"))
    }),
    // indel has no DuckDB analog -> rows-only check
    "fuzzy_join_indel" -> ((s, dir) => {
      val res = FuzzyMatcher.matchDfs(
        t(s, dir, "customer"), t(s, dir, "supplier"),
        Seq(FuzzyMapping("c_name", "s_name", 70.0, Indel)))
      res.select(col("c_custkey"), col("s_suppkey"),
        sround(col("c_name_vs_s_name_indel"), 6).as("score"))
    }),
    // ---- multi-pass fuzzy join: two mappings, intersection semantics
    "fuzzy_join_multi" -> ((s, dir) => {
      val res = FuzzyMatcher.matchDfs(
        t(s, dir, "customer"), t(s, dir, "customer"),
        Seq(
          FuzzyMapping("c_name", "c_name", 80.0, Levenshtein),
          FuzzyMapping("c_mktsegment", "c_mktsegment", 80.0, JaroWinkler)))
      res.select(col("c_custkey"), col("c_custkey_right"),
        sround(col("c_name_vs_c_name_right_levenshtein"), 6).as("score_name"),
        sround(col("c_mktsegment_vs_c_mktsegment_right_jaro_winkler"), 6).as("score_seg"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "fuzzy_join_levenshtein" ->
      """SELECT c.c_custkey AS c_custkey, s.s_suppkey AS s_suppkey,
         round(1.0 - levenshtein(lower(c.c_name), lower(s.s_name)) / greatest(length(c.c_name), length(s.s_name)), 6) AS score
         FROM customer c CROSS JOIN supplier s
         WHERE levenshtein(lower(c.c_name), lower(s.s_name)) / greatest(length(c.c_name), length(s.s_name)) <= 0.3""",
    "fuzzy_join_damerau" ->
      """SELECT c.c_custkey AS c_custkey, s.s_suppkey AS s_suppkey,
         round(1.0 - damerau_levenshtein(lower(c.c_name), lower(s.s_name)) / greatest(length(c.c_name), length(s.s_name)), 6) AS score
         FROM customer c CROSS JOIN supplier s
         WHERE damerau_levenshtein(lower(c.c_name), lower(s.s_name)) / greatest(length(c.c_name), length(s.s_name)) <= 0.3""",
    "fuzzy_join_jaro" ->
      """SELECT c.c_custkey AS c_custkey, s.s_suppkey AS s_suppkey,
         round(jaro_similarity(lower(c.c_name), lower(s.s_name)), 6) AS score
         FROM customer c CROSS JOIN supplier s
         WHERE 1.0 - jaro_similarity(lower(c.c_name), lower(s.s_name)) <= 0.2""",
    "fuzzy_join_jaro_winkler" ->
      """SELECT a.c_custkey AS c_custkey, b.c_custkey AS c_custkey_right,
         round(jaro_winkler_similarity(lower(a.c_name), lower(b.c_name)), 6) AS score
         FROM customer a CROSS JOIN customer b
         WHERE 1.0 - jaro_winkler_similarity(lower(a.c_name), lower(b.c_name)) <= 0.1""",
    "fuzzy_join_hamming" ->
      """SELECT a.c_custkey AS c_custkey, b.c_custkey AS c_custkey_right,
         round(1.0 - hamming(lower(a.c_name), lower(b.c_name)) / greatest(length(a.c_name), length(b.c_name)), 6) AS score
         FROM customer a CROSS JOIN customer b
         WHERE hamming(lower(a.c_name), lower(b.c_name)) / greatest(length(a.c_name), length(b.c_name)) <= 0.2""",
    "fuzzy_join_multi" ->
      """SELECT a.c_custkey AS c_custkey, b.c_custkey AS c_custkey_right,
         round(1.0 - levenshtein(lower(a.c_name), lower(b.c_name)) / greatest(length(a.c_name), length(b.c_name)), 6) AS score_name,
         round(jaro_winkler_similarity(lower(a.c_mktsegment), lower(b.c_mktsegment)), 6) AS score_seg
         FROM customer a CROSS JOIN customer b
         WHERE levenshtein(lower(a.c_name), lower(b.c_name)) / greatest(length(a.c_name), length(b.c_name)) <= 0.2
           AND 1.0 - jaro_winkler_similarity(lower(a.c_mktsegment), lower(b.c_mktsegment)) <= 0.2""",
  )
}
