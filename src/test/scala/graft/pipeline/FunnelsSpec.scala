package graft.pipeline

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class FunnelsSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts_us", "event_type")

  test("funnel counts steps only in order (earliest-achievable times)") {
    val events = ev(
      // user 1: full ordered funnel
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2: click BEFORE the first view -> step 2 not reached
      (2L, 10L, "click"), (2L, 20L, "view"),
      // user 3: purchase before click -> steps_completed 2, not 3
      (3L, 10L, "view"), (3L, 15L, "purchase"), (3L, 20L, "click"),
      // user 4: never viewed -> not a funnel entrant at all
      (4L, 10L, "click"), (4L, 20L, "purchase"),
      // user 5: simultaneous view+click counts (inclusive >=)
      (5L, 10L, "view"), (5L, 10L, "click"))
    val m = Funnels.funnelSteps(events, "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(m.keySet == Set(1L, 2L, 3L, 5L), s"got $m")
    assert(m(1L) == ((3L, 10L, 20L, 30L)))
    assert(m(2L) == ((1L, 20L, -1L, -1L)), "pre-view click must not count")
    assert(m(3L) == ((2L, 10L, 20L, -1L)), "pre-click purchase must not count")
    assert(m(5L) == ((2L, 10L, 10L, -1L)), "equal timestamps are inclusive")
  }

  test("transition counts pair consecutive events per user, deterministic ties") {
    val events = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "view"),
      // equal ts: order by event_id -> view(4) then click(5)
      (2L, 10L, 4L, "view"), (2L, 10L, 5L, "click"),
      (3L, 10L, 6L, "purchase")  // single event -> no transition
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val m = Funnels.transitionCounts(events, "user_id", "ts_us", "event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m == Map(("view", "click") -> 2L, ("click", "view") -> 1L), s"got $m")
  }

  test("cohort retention buckets by first-activity period") {
    val period = 100L
    val events = Seq(
      (1L, 10L), (1L, 110L), (1L, 310L),   // cohort 0, offsets 0,1,3
      (2L, 120L), (2L, 130L),              // cohort 1, offset 0 (once)
      (3L, 10L), (3L, 110L)                // cohort 0, offsets 0,1
    ).toDF("user_id", "ts_us")
    val m = Funnels.cohortRetention(events, "user_id", "ts_us", period)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == Map((0L, 0L) -> 2L, (0L, 1L) -> 2L, (0L, 3L) -> 1L,
      (1L, 0L) -> 1L), s"got $m")
  }

  test("path trigrams: per-user order, no cross-user paths, top-k tie-break") {
    import spark.implicits._
    // user 1: a b c d -> (a,b,c), (b,c,d); user 2: a b c -> (a,b,c)
    val ev = Seq(
      (1L, 10L, "a", 1L), (1L, 20L, "b", 2L), (1L, 30L, "c", 3L), (1L, 40L, "d", 4L),
      (2L, 10L, "a", 5L), (2L, 20L, "b", 6L), (2L, 30L, "c", 7L)
    ).toDF("user_id", "ts_us", "event_type", "event_id")
    val got = Funnels.pathTrigrams(ev, "user_id", "ts_us", "event_type",
        "event_id", 10)
      .as[(String, String, String, Long)].collect().toSet
    assert(got == Set(("a", "b", "c", 2L), ("b", "c", "d", 1L)), s"got $got")
    // top-1 keeps the most common; ties break by path ascending
    val top1 = Funnels.pathTrigrams(ev, "user_id", "ts_us", "event_type",
        "event_id", 1).as[(String, String, String, Long)].collect().toSeq
    assert(top1 == Seq(("a", "b", "c", 2L)))
  }
}
