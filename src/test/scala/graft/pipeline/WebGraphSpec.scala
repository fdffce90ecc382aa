package graft.pipeline

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** [[WebGraph.pageRank]] against hand-computed fixed-point values — the
  * integer arithmetic is simple enough to verify on paper for tiny
  * graphs, which pins the semantics (damping order, truncating
  * divisions, dangling-mass drop) independently of the generated
  * oracle. */
class WebGraphSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int,
                    scale: Long): Map[Long, Long] =
    WebGraph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters, scale)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("2-cycle is a fixed point: base + 85% of the other's full rank") {
    // n=2, init = 500000, base = 1000000*15/100/2 = 75000,
    // step: 75000 + 85*500000/100 = 500000 — stable at every iteration
    val r = ranks(Seq((1L, 2L), (2L, 1L)), iters = 3, scale = 1000000L)
    assert(r == Map(1L -> 500000L, 2L -> 500000L), s"got $r")
  }

  test("dangling mass drops: a pure sink keeps receiving, a pure source " +
    "decays to the base share") {
    // A(1) -> B(2): n=2, init=500000, base=75000
    // iter1: A = 75000 (nothing incoming), B = 75000 + 85*500000/100 = 500000
    // iter2: A = 75000, B = 75000 + 85*75000/100 = 75000 + 63750 = 138750
    val r = ranks(Seq((1L, 2L)), iters = 2, scale = 1000000L)
    assert(r == Map(1L -> 75000L, 2L -> 138750L), s"got $r")
  }

  test("out-degree split truncates per edge (exact integer division)") {
    // A(1) -> B(2), A -> C(3); B -> A, C -> A. n=3, scale=999999.
    // init = 333333, base = 999999*15/100/3 = 49999 (truncating!)
    // iter1: contrib(A->each) = 333333/2 = 166666 (truncated)
    //   B = C = 49999 + 85*166666/100 = 49999 + 141666 = 191665
    //   A = 49999 + 85*(333333+333333)/100 = 49999 + 566666 = 616665
    val r = ranks(Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L)),
      iters = 1, scale = 999999L)
    assert(r == Map(1L -> 616665L, 2L -> 191665L, 3L -> 191665L), s"got $r")
  }

  test("self-loops and duplicate edges are dropped before the walk") {
    val withJunk = Seq((1L, 2L), (1L, 2L), (2L, 1L), (1L, 1L))
    val clean = Seq((1L, 2L), (2L, 1L))
    assert(ranks(withJunk, 2, 1000000L) == ranks(clean, 2, 1000000L))
  }
}
