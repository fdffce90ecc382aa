package graft.pipeline

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** AsofJoin vs a brute-force in-memory reference on randomized data —
  * the window-plan rewrite must be EXACTLY the naive per-row backward
  * (and forward) scan, across duplicate left timestamps, key skew, and
  * empty sides. */
class AsofJoinPropertySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)

  private def randomFrames(nLeft: Int, nRight: Int, nKeys: Int, tsRange: Int) = {
    val left = (0 until nLeft).map(i =>
      (s"k${rnd.nextInt(nKeys)}", rnd.nextInt(tsRange).toLong, i.toLong))
    // right: unique per (key, ts) — the operator's contract
    val right = (0 until nRight).map(i =>
      (s"k${rnd.nextInt(nKeys)}", rnd.nextInt(tsRange).toLong, 1000L + i))
      .groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq
    (left, right)
  }

  private def bruteBackward(left: Seq[(String, Long, Long)],
                            right: Seq[(String, Long, Long)]) =
    left.map { case (k, ts, id) =>
      val cands = right.filter(r => r._1 == k && r._2 <= ts)
      id -> (if (cands.isEmpty) None else Some(cands.maxBy(_._2)._3))
    }.toMap

  private def bruteForward(left: Seq[(String, Long, Long)],
                           right: Seq[(String, Long, Long)]) =
    left.map { case (k, ts, id) =>
      val cands = right.filter(r => r._1 == k && r._2 >= ts)
      id -> (if (cands.isEmpty) None else Some(cands.minBy(_._2)._3))
    }.toMap

  private def bruteNearest(left: Seq[(String, Long, Long)],
                           right: Seq[(String, Long, Long)]) =
    left.map { case (k, ts, id) =>
      val cands = right.filter(_._1 == k)
      id -> (if (cands.isEmpty) None
             // ties at equal distance go to the at-or-before side
             else Some(cands.minBy(c => (math.abs(c._2 - ts), if (c._2 <= ts) 0 else 1))._3))
    }.toMap

  test("backward, forward and nearest equal the brute-force scan on random data") {
    for (trial <- 1 to 5) {
      // tight tsRange forces equal-timestamp collisions on both sides
      val (l, r) = randomFrames(nLeft = 200, nRight = 150, nKeys = 7, tsRange = 40)
      val lDf = l.toDF("k", "ts", "lid")
      val rDf = r.toDF("k", "rts", "rid")
      val gotB = AsofJoin.backward(lDf, rDf, Seq("k"), "ts", "rts", Seq("rid"))
        .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
      assert(gotB == bruteBackward(l, r), s"backward diverged on trial $trial")
      val gotF = AsofJoin.forward(lDf, rDf, Seq("k"), "ts", "rts", Seq("rid"))
        .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
      assert(gotF == bruteForward(l, r), s"forward diverged on trial $trial")
      val gotN = AsofJoin.nearest(lDf, rDf, Seq("k"), "ts", "rts", Seq("rid"))
        .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
      assert(gotN == bruteNearest(l, r), s"nearest diverged on trial $trial")
    }
  }

  test("empty right side yields all-null payloads; empty left yields no rows") {
    val lDf = Seq(("a", 1L, 1L)).toDF("k", "ts", "lid")
    val rDf = Seq.empty[(String, Long, Long)].toDF("k", "rts", "rid")
    val out = AsofJoin.backward(lDf, rDf, Seq("k"), "ts", "rts", Seq("rid"))
      .select($"lid", $"rid").as[(Long, Option[Long])].collect()
    assert(out.toSeq == Seq((1L, None)))
    val none = AsofJoin.backward(rDf.limit(0).toDF("k", "ts", "lid"),
      Seq(("a", 1L, 2L)).toDF("k", "rts", "rid"), Seq("k"), "ts", "rts", Seq("rid"))
    assert(none.count() == 0)
  }
}
