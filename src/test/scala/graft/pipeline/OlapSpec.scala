package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rollup / pivot wrappers ([[Olap]]): level semantics, totals
  * consistency, and the single-pass plan shapes that make them the right
  * call at scale.
  */
class OlapSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("rollup levels are consistent: leaves sum to subtotals to the total") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val r = Olap.rollupProfile(docs, Seq("lang", "source"), "n_chars")
    val leaves = r.where(col("level") === 0)
    val langTot = r.where(col("level") === 1)
    val grand = r.where(col("level") === 3).collect()
    assert(grand.length === 1 && grand.head.getAs[String]("lang") === "ALL")
    assert(grand.head.getAs[Long]("n_rows") === docs.count())
    // per-lang subtotals equal the sum of their leaves
    val fromLeaves = leaves.groupBy(col("lang"))
      .agg(sum(col("n_rows")).as("n"), sum(col("sum_value")).as("s"))
      .collect().map(r0 => r0.getString(0) -> (r0.getLong(1), r0.getLong(2))).toMap
    langTot.collect().foreach { row =>
      val got = (row.getAs[Long]("n_rows"), row.getAs[Long]("sum_value"))
      assert(fromLeaves(row.getAs[String]("lang")) === got)
      assert(row.getAs[String]("source") === "ALL")
    }
  }

  test("cube adds the source-only subtotals rollup lacks; one Expand pass") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val c = Olap.cubeProfile(docs, Seq("lang", "source"), "n_chars")
    val r = Olap.rollupProfile(docs, Seq("lang", "source"), "n_chars")
    // cube ⊇ rollup: levels 0 (leaf), 1 (lang subtotal), 3 (grand) match
    for (lvl <- Seq(0L, 1L, 3L)) {
      val cs = c.where(col("level") === lvl).collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(3), x.getLong(4))).toSet
      val rs = r.where(col("level") === lvl).collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(3), x.getLong(4))).toSet
      assert(cs === rs, s"level $lvl differs between cube and rollup")
    }
    // level 2 = source subtotals (lang rolled up) — cube-only, and they
    // must sum leaves per source
    val bySource = c.where(col("level") === 0).groupBy(col("source"))
      .agg(sum(col("n_rows")).as("n")).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    val lvl2 = c.where(col("level") === 2).collect()
    assert(lvl2.nonEmpty && r.where(col("level") === 2).count() === 0)
    lvl2.foreach { row =>
      assert(row.getAs[String]("lang") === "ALL")
      assert(bySource(row.getAs[String]("source")) === row.getAs[Long]("n_rows"))
    }
    val plan = c.queryExecution.executedPlan.toString
    assert(plan.contains("Expand") && !plan.contains("Union"))
  }

  test("rollup plans as ONE Expand + aggregate, not a union of aggregates") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = Olap.rollupProfile(docs, Seq("lang", "source"), "n_chars")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup lost its Expand encoding:\n$plan")
    assert(!plan.contains("Union"), s"rollup degenerated to a union of aggregates:\n$plan")
  }

  test("genuine NULL group values stay NULL on leaf rows (not relabeled ALL)") {
    import spark.implicits._
    val docs = Seq((Option("en"), "s1", 10L), (Option.empty[String], "s1", 20L))
      .toDF("lang", "source", "n_chars")
    val r = Olap.rollupProfile(docs, Seq("lang", "source"), "n_chars")
    // the NULL-lang LEAF row keeps its NULL; only rolled-up cells say ALL
    val leafNull = r.where(col("level") === 0 && col("lang").isNull).collect()
    assert(leafNull.length === 1 && leafNull.head.getAs[Long]("sum_value") === 20L)
    val grand = r.where(col("level") === 3).collect()
    assert(grand.length === 1 && grand.head.getAs[String]("lang") === "ALL")
    // the per-lang subtotal of the NULL lang is labeled by its level bit,
    // distinguishable from a data value even though lang is NULL there
    assert(r.where(col("level") === 1 && col("lang").isNull).count() === 1L)
  }

  test("pivot counts match the long-format groupBy, empty cells are 0") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val p = Olap.pivotCounts(docs, "source", "lang", Seq("en", "de", "zz_absent"))
    val long = docs.where(col("lang").isin("en", "de"))
      .groupBy("source", "lang").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    p.collect().foreach { row =>
      val src = row.getString(0)
      assert(row.getAs[Long]("n_en") === long.getOrElse((src, "en"), 0L))
      assert(row.getAs[Long]("n_de") === long.getOrElse((src, "de"), 0L))
      assert(row.getAs[Long]("n_zz_absent") === 0L)
    }
  }

  test("explicit-list pivot is one shuffle (no category-discovery pass)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = Olap.pivotCounts(docs, "source", "lang", Seq("en", "de"))
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"pivot should shuffle exactly once, saw $exchanges:\n$plan")
  }
}
