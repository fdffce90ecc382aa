package graft.fuzzy

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class PreProcessSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("uniqueness formula golden values (tests/test_pre_process.py:113-117)") {
    assert(PreProcess.calculateUniqueness(0.5, 0.5) == 0.75)
    assert(PreProcess.calculateUniqueness(0.6, 0.8) == 1.3000000000000003)
    assert(PreProcess.calculateUniqueness(0.6, 0.5) == 0.905)
    assert(PreProcess.calculateUniqueness(0.1, 0.3) == 0.35)
  }

  test("aggregation heuristic boundary (tests/test_pre_process.py:158-161)") {
    assert(PreProcess.needsAggregation(0.5, 10_200_000))
    assert(!PreProcess.needsAggregation(0.5, 1_000_000))
    assert(!PreProcess.needsAggregation(1.2, 10_200_000))
  }

  test("mapping order: most selective first, stable for ties") {
    val maps = Seq(
      FuzzyMapping("a", "x", percUnique = 0.3),
      FuzzyMapping("b", "y", percUnique = 2.0),
      FuzzyMapping("c", "z", percUnique = 1.1))
    assert(PreProcess.orderMaps(maps).map(_.leftCol) == Seq("b", "c", "a"))
    val ties = Seq(FuzzyMapping("p", "x", percUnique = 1.0), FuzzyMapping("q", "y", percUnique = 1.0))
    assert(PreProcess.orderMaps(ties).map(_.leftCol) == Seq("p", "q"))
  }

  test("low-uniqueness inputs get deduplicated on the mapped columns") {
    // 2000x2000 cartesian > 1e6 with 2 distinct values per side -> dedup
    val left = (1 to 2000).map(i => (i, if (i % 2 == 0) "aa" else "bb")).toDF("id", "k")
    val right = (1 to 2000).map(i => (i, if (i % 2 == 0) "aa" else "bc")).toDF("rid", "rk")
    val plan = PreProcess.run(left, right, Seq(FuzzyMapping("k", "rk", 80.0)))
    assert(plan.left.count() == 2)
    assert(plan.right.count() == 2)
  }

  test("high-uniqueness inputs stay untouched") {
    val left = (1 to 2000).map(i => (i, s"name_$i")).toDF("id", "k")
    val right = (1 to 2000).map(i => (i, s"nam_$i")).toDF("rid", "rk")
    val plan = PreProcess.run(left, right, Seq(FuzzyMapping("k", "rk", 80.0)))
    assert(plan.left.count() == 2000)
    assert(plan.right.count() == 2000)
  }
}

class NameUtilsSpec extends AnyFunSuite {

  test("output name generation (tests/test_output_column_name_utils.py)") {
    assert(NameUtils.generateOutputColumnName(FuzzyMapping("city", "other_city"))
      == "city_vs_other_city_levenshtein")
  }

  test("duplicate names get _N counters") {
    val maps = (1 to 10).map(_ => FuzzyMapping("a", "b")) :+ FuzzyMapping("city", "other_city")
    val named = NameUtils.setNamesInMappings(maps)
    assert(named.head.outputColumnName.contains("a_vs_b_levenshtein"))
    (1 until 10).foreach { i =>
      assert(named(i).outputColumnName.contains(s"a_vs_b_levenshtein_$i"))
    }
    assert(named.last.outputColumnName.contains("city_vs_other_city_levenshtein"))
  }

  test("simple right-column rename") {
    assert(NameUtils.renameRightColumns(Seq("id", "name"), Seq("id", "value"))
      == Map("id" -> "id_right"))
  }

  test("partial overlap: only colliding columns renamed (test_pre_process.py:307-317)") {
    assert(NameUtils.renameRightColumns(Seq("b", "d"), Seq("a", "b", "c", "d"))
      == Map("b" -> "b_right", "d" -> "d_right"))
  }

  test("pathological suffix chain (test_pre_process.py:294-305)") {
    val leftCols = "id" +: (1 to 5).map(i => "id" + "_right" * i)
    val renames = NameUtils.renameRightColumns(leftCols, Seq("id", "value"))
    assert(renames == Map("id" -> ("id" + "_right" * 6)))
  }

  test("self-conflict within right side reserves new names") {
    // right has both id and id_right; id must skip to id_right_right
    val renames = NameUtils.renameRightColumns(Seq("id"), Seq("id", "id_right"))
    assert(renames == Map("id" -> "id_right_right"))
  }

  test("empty suffix rejected") {
    intercept[IllegalArgumentException] {
      NameUtils.renameRightColumns(Seq("a"), Seq("a"), suffix = "")
    }
  }
}
