package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  // (key, ts, quote_id) — the reference side
  private def quotes = Seq(
    ("A", 10L, 100L), ("A", 20L, 101L), ("A", 30L, 102L),
    ("B", 15L, 200L)).toDF("k", "qts", "quote_id")

  // (key, ts, trade_id) — the probe side
  private def trades = Seq(
    ("A", 5L, 1L),   // before every quote -> no match
    ("A", 20L, 2L),  // exactly at a quote -> inclusive match (101)
    ("A", 25L, 3L),  // between 20 and 30 -> 101
    ("A", 99L, 4L),  // after the last -> 102
    ("B", 15L, 5L),  // equal-ts on another key -> 200
    ("C", 50L, 6L)   // key with no quotes at all -> no match
  ).toDF("k", "tts", "trade_id")

  private def run() =
    AsofJoin.backward(trades, quotes, Seq("k"), "tts", "qts", Seq("quote_id"))
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().toMap

  test("backward picks the latest right row at or before each left row") {
    val m = run()
    assert(m(1L).isEmpty, "a trade before every quote matches nothing")
    assert(m(2L).contains(101L), "equal timestamps match inclusively (>= semantics)")
    assert(m(3L).contains(101L))
    assert(m(4L).contains(102L), "a trade after the last quote takes the final one")
    assert(m(5L).contains(200L))
    assert(m(6L).isEmpty, "a key absent from the right side matches nothing")
  }

  test("every left row survives exactly once and left columns pass through") {
    val out = AsofJoin.backward(trades, quotes, Seq("k"), "tts", "qts", Seq("quote_id"))
    assert(out.count() == trades.count())
    assert(out.columns.toSeq == Seq("k", "tts", "trade_id", "quote_id"))
    // left payload unchanged, including its own timestamp column
    assert(out.where($"trade_id" === 3L).select($"k", $"tts").as[(String, Long)]
      .head() == ("A", 25L))
  }

  test("multi-column keys partition the match space") {
    val r = Seq(("A", 1, 10L, 900L), ("A", 2, 10L, 901L)).toDF("k1", "k2", "rts", "rid")
    val l = Seq(("A", 1, 50L, 70L), ("A", 2, 50L, 71L), ("B", 1, 50L, 72L))
      .toDF("k1", "k2", "lts", "lid")
    val m = AsofJoin.backward(l, r, Seq("k1", "k2"), "lts", "rts", Seq("rid"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(m(70L).contains(900L) && m(71L).contains(901L) && m(72L).isEmpty)
  }

  test("payload name clashes with left columns are rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.backward(trades, quotes.withColumnRenamed("quote_id", "trade_id"),
        Seq("k"), "tts", "qts", Seq("trade_id"))
    }
  }

  test("forward picks the earliest right row at or after each left row") {
    val m = AsofJoin.forward(trades, quotes, Seq("k"), "tts", "qts", Seq("quote_id"))
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(m(1L).contains(100L), "a trade before every quote takes the first")
    assert(m(2L).contains(101L), "equal timestamps match inclusively")
    assert(m(3L).contains(102L))
    assert(m(4L).isEmpty, "a trade after the last quote matches nothing forward")
    assert(m(5L).contains(200L))
    assert(m(6L).isEmpty)
  }

  test("tolerance nulls matches beyond the bound, keeps the row") {
    val m = AsofJoin.backward(trades, quotes, Seq("k"), "tts", "qts",
        Seq("quote_id"), tolerance = Some(lit(5L)))
      .select($"trade_id", $"quote_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(m.size == 6, "tolerance must not drop left rows")
    assert(m(2L).contains(101L), "distance 0 is within tolerance")
    assert(m(3L).contains(101L), "distance 5 is within tolerance (inclusive)")
    assert(m(4L).isEmpty, "distance 69 exceeds tolerance")
  }

  test("plan shape: one window over the union, no join operator anywhere") {
    val out = AsofJoin.backward(trades, quotes, Seq("k"), "tts", "qts", Seq("quote_id"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), s"expected a window plan:\n$plan")
    assert(!plan.toLowerCase.contains("join"),
      s"the as-of plan must not degrade to a join:\n$plan")
  }
}
