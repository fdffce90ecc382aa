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

  test("danglingRedistribute conserves total mass (up to truncation) and " +
    "matches the hand-computed shares") {
    // A(1) -> B(2), B dangling. n=2, scale=1000000, init=500000, base=75000
    // iter1: D=500000, dShare=250000
    //   A = 75000 + 85*250000/100          = 287500
    //   B = 75000 + 85*(500000+250000)/100 = 712500   (sum = scale)
    // iter2: D=712500, dShare=356250
    //   A = 75000 + 85*356250/100          = 75000 + 302812 = 377812
    //   B = 75000 + 85*(287500+356250)/100 = 75000 + 547187 = 622187
    val r = WebGraph.pageRank(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst",
        iterations = 2, scale = 1000000L, danglingRedistribute = true)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 377812L, 2L -> 622187L), s"got $r")
    // versus the dropped-mass arm, which decays A to its base share
    assert(ranks(Seq((1L, 2L)), 2, 1000000L) == Map(1L -> 75000L, 2L -> 138750L))
  }

  test("scale above Long.MaxValue/100 is rejected loudly (overflow guard)") {
    val e = intercept[IllegalArgumentException] {
      WebGraph.pageRank(Seq((1L, 2L), (2L, 1L)).toDF("src", "dst"),
        "src", "dst", iterations = 1, scale = Long.MaxValue / 100 + 1)
    }
    assert(e.getMessage.contains("scale"), e.getMessage)
  }

  test("CheckpointStrategy threads through: Reliable leaves ONLY the final " +
    "ranks' checkpoint files under the caller's dir, same values as Local") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pr_ckpt").toFile
    try {
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst")
      val rel = WebGraph.pageRank(edges, "src", "dst", iterations = 3,
          scale = 1000000L,
          strategy = graft.util.CheckpointStrategy.Reliable(dir.getAbsolutePath))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val loc = ranks(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)), 3, 1000000L)
      assert(rel == loc, s"Reliable $rel != Local $loc")
      // e/nodes/eDeg and every superseded iteration released their files;
      // only the returned ranks frame still owns a checkpoint
      def rddDirs(f: java.io.File): Seq[java.io.File] =
        if (f.getName.startsWith("rdd-")) Seq(f)
        else Option(f.listFiles()).toSeq.flatten.flatMap(rddDirs)
      val left = rddDirs(dir)
      assert(left.size == 1,
        s"expected exactly the final ranks' rdd dir, got: $left")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm); f.delete()
      }
      rm(dir)
    }
  }

  test("pageRankKeys: string-keyed walk matches the LONG walk through a " +
    "manual dictionary; null endpoints drop; no retained intermediates") {
    val sc = spark.sparkContext
    // the LONG-walk comparison runs FIRST: the ranks() helper leaks its
    // materialized result by design (test-scoped), so it must precede
    // the retained-blocks snapshot or it counts against pageRankKeys
    val long = ranks(Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L)),
      3, 1000000L)
    val before = sc.getPersistentRDDs.keySet
    val edges = Seq(("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "a.com"),
      ("a.com", "c.com"), (null, "a.com"), ("b.com", null))
      .toDF("src", "dst")
    // hold the frame reference: the returned barrier must stay REACHABLE
    // through the retained-blocks assertion, or a GC + async
    // ContextCleaner unpersist can race it to added.size == 0
    val out = WebGraph.pageRankKeys(edges, "src", "dst", iterations = 3,
      scale = 1000000L)
    val keyed = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keyed == Map("a.com" -> long(0L), "b.com" -> long(1L),
      "c.com" -> long(2L)), s"got $keyed vs $long")
    val addedMap = sc.getPersistentRDDs.filterNot { case (id, _) => before(id) }
    assert(addedMap.size == 1,
      "pageRankKeys must retain exactly the returned frame, got " +
        addedMap.map { case (id, r) => s"$id=$r" }.mkString("; "))
    graft.util.Materialize.release(out)
  }

  test("no graph-sized intermediates are retained after the call " +
    "(ADVICE r17: e/nodes/eDeg released, only the result holds blocks)") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val out = WebGraph.pageRank(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"),
      "src", "dst", iterations = 4, scale = 1000000L)
    val added = sc.getPersistentRDDs.keySet -- before
    assert(added.size == 1,
      s"pageRank must retain exactly the returned ranks' blocks, got $added")
    graft.util.Materialize.release(out)
  }
}
