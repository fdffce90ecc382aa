package graft.pipeline

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** [[Curation.corpusDiff]] + [[Curation.forgetAudit]]/[[Curation.forget]] —
  * the snapshot-diff and delete-cascade surface of a nightly corpus
  * pipeline. */
class VersioningSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("corpusDiff labels added / removed / changed / unchanged by digest") {
    val oldV = Seq((1L, "same", "s1"), (2L, "was", "s1"), (3L, "gone", "s2"))
      .toDF("id", "text", "source")
    val newV = Seq((1L, "same", "s1"), (2L, "now", "s1"), (4L, "new", "s3"))
      .toDF("id", "text", "source")
    val res = Curation.corpusDiff(oldV, newV, "id", Seq("text", "source"))
      .as[(Long, String)].collect().toMap
    assert(res == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("corpusDiff: the separator keeps adjacent columns from aliasing") {
    val oldV = Seq((1L, "ab", "c")).toDF("id", "a", "b")
    val newV = Seq((1L, "a", "bc")).toDF("id", "a", "b")
    val res = Curation.corpusDiff(oldV, newV, "id", Seq("a", "b"))
      .as[(Long, String)].collect().toMap
    assert(res(1L) == "changed")
  }

  test("forgetAudit counts the cascade and catches orphaned children") {
    val parent = Seq(1L, 2L, 3L, 4L).toDF("id")
    val forget = Seq(2L, 4L).toDF("id")
    // child rows: two per surviving parent 1, one per forgotten parent 2,
    // and one ORPHAN referencing parent 9 that never existed
    val child = Seq(1L, 1L, 2L, 9L).toDF("pid")
    val res = Curation.forgetAudit(parent, "id", forget,
      Seq(("child", child, "pid")))
      .collect()
      .map(r => r.getAs[String]("artifact") ->
        (r.getAs[Long]("total"), r.getAs[Long]("forgotten"),
          r.getAs[Long]("remaining"), r.getAs[Long]("orphans")))
      .toMap
    assert(res("__parent__") == (4L, 2L, 2L, 0L))
    assert(res("child") == (4L, 1L, 3L, 1L))
  }

  test("drift pairs both snapshots' column stats; a vanished column of " +
    "values shows as the numbers moving") {
    val oldV = Seq((1L, "en", 10L), (2L, "de", 20L), (3L, "en", 30L))
      .toDF("id", "lang", "n")
    val newV = Seq((1L, "en", 10L), (2L, null.asInstanceOf[String], 20L))
      .toDF("id", "lang", "n")
    val res = Profile.drift(oldV, newV, Seq("lang", "n")).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val lang = res("lang")
    assert(lang.getAs[Long]("n_rows_old") == 3L && lang.getAs[Long]("n_rows_new") == 2L)
    assert(lang.getAs[Long]("n_nulls_old") == 0L && lang.getAs[Long]("n_nulls_new") == 1L)
    assert(lang.getAs[Long]("n_distinct_old") == 2L && lang.getAs[Long]("n_distinct_new") == 1L)
    val n = res("n")
    assert(n.getAs[String]("max_old") == "30" && n.getAs[String]("max_new") == "20")
  }

  test("driftFromProfiles keeps one-sided columns with sentinels instead " +
    "of silently dropping them from the report") {
    val oldP = Profile.columns(Seq((1L, "x")).toDF("id", "a"), Seq("id", "a"))
    val newP = Profile.columns(Seq((1L, "y")).toDF("id", "b"), Seq("id", "b"))
    val res = Profile.driftFromProfiles(oldP, newP).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    assert(res.keySet == Set("id", "a", "b"))
    assert(res("a").getAs[Long]("n_rows_new") == -1L &&
      res("a").getAs[String]("max_new") == "")
    assert(res("b").getAs[Long]("n_rows_old") == -1L &&
      res("b").getAs[Long]("n_rows_new") == 1L)
  }

  test("oovRate: unknown tokens counted, empty docs emit zeros not nulls") {
    import org.apache.spark.sql.functions.col
    val vocab = Seq("the", "cat").toDF("token")
    val docs = Seq((1L, "the cat sat"), (2L, ""), (3L, "THE the"))
      .toDF("doc_id", "text")
    val res = TextAnalysis.oovRate(docs, "text", "doc_id", vocab)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_frac")))
      .toMap
    assert(res(1L) == (3L, 1L, 0.333333)) // "sat" is OOV
    assert(res(2L) == (0L, 0L, 0.0))      // empty doc: zeros, never null
    assert(res(3L) == (2L, 0L, 0.0))      // tokenization lowercases
    assert(!res.values.exists(_._3.isNaN))
    // a CASED vocab (a fixed tokenizer's file) must not inflate OOV —
    // entries are lowercased to match the token canonicalization
    val cased = TextAnalysis.oovRate(docs.where(col("doc_id") === 3L),
        "text", "doc_id", Seq("THE").toDF("token"))
      .head()
    assert(cased.getAs[Long]("n_oov") == 0L)
  }

  test("forget removes forgotten parents and their children, nothing else") {
    val parent = Seq((1L, "keep"), (2L, "drop")).toDF("id", "text")
    val forget = Seq(2L).toDF("id")
    val child = Seq((1L, 10L), (2L, 20L), (2L, 21L)).toDF("pid", "row")
    val (p, cs) = Curation.forget(parent, "id", forget, Seq(("c", child, "pid")))
    assert(p.as[(Long, String)].collect().toSeq == Seq((1L, "keep")))
    assert(cs.head._2.select("pid", "row").as[(Long, Long)].collect().toSet ==
      Set((1L, 10L)))
  }
}
