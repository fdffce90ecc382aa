package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The property a 100 TB multi-pass run actually needs from
  * `CheckpointStrategy.Reliable(dir)`: once the barrier is taken, the
  * checkpointed frame is served from the reliable directory — the ORIGINAL
  * INPUT can disappear entirely (the executor-loss analogue testable in a
  * single JVM: lineage is cut and nothing re-reads the source) and every
  * downstream consumer still works.
  */
class MaterializeSpec extends AnyFunSuite with SparkSpec {

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))

  test("Reliable(dir) survives loss of the source data (recovery barrier)") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft_reliable_src")
    val ckptDir = Files.createTempDirectory("graft_reliable_ckpt")
    try {
      (1L to 1000L).map(i => (i, s"value_$i")).toDF("id", "v")
        .write.mode("overwrite").parquet(src.toString)

      val fromSource = spark.read.parquet(src.toString).where(col("id") % 2 === 0)
      val barrier = Materialize(fromSource, CheckpointStrategy.Reliable(ckptDir.toString))

      // the barrier must have written real files into the caller's dir
      assert(Files.walk(ckptDir).filter(Files.isRegularFile(_)).count() > 0,
        "Reliable barrier wrote nothing into the checkpoint dir")

      // simulate total loss of the upstream: delete every source file
      deleteRecursively(src)

      // downstream consumption — a count AND a self-join (new jobs, new
      // scans) — must be served from the checkpoint, never the source
      assert(barrier.count() == 500L)
      val joined = barrier.as("a").join(barrier.as("b"), Seq("id"))
        .agg(sum(col("a.id"))).head().getLong(0)
      assert(joined == (2L to 1000L by 2).sum)
    } finally {
      deleteRecursively(src)
      deleteRecursively(ckptDir)
    }
  }

  test("withMatchScope releases every localCheckpoint block on close") {
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    var during = 0
    var result = 0L
    MatchScope.withMatchScope {
      val a = Materialize(
        (1L to 100L).toDF("id"), CheckpointStrategy.Local)
      val b = Materialize(
        a.where(col("id") % 2 === 0), CheckpointStrategy.Local)
      during = (sc.getPersistentRDDs.keySet -- before).size
      result = b.count() // consume INSIDE the scope
    }
    assert(during >= 2, s"expected >=2 live barrier RDDs in scope, saw $during")
    assert(result == 50L)
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"scope leaked persistent RDDs: $leaked")
  }

  test("withMatchScope releases barriers through a full eager fuzzy match") {
    import graft.fuzzy._
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val left = (1 to 200).map(i => s"acme corp $i").toDF("name")
    val right = (1 to 150).map(i => s"acme corp ${i * 2}").toDF("company")
    var rows = 0L
    var during = 0
    MatchScope.withMatchScope {
      val out = FuzzyMatcher.matchDfsEager(left, right,
        Seq(FuzzyMapping("name", "company", thresholdScore = 80.0)), MatchOptions())
      during = (sc.getPersistentRDDs.keySet -- before).size
      rows = out.count()
    }
    assert(rows > 0)
    assert(during > 0, "match created no barriers?")
    val leaked = sc.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"matchDfsEager leaked ${leaked.size} barrier RDDs past the scope: $leaked")
  }

  test("withTempMatchDir deletes every checkpoint file on exit (reference parity)") {
    import spark.implicits._
    var dirUsed: String = null
    var filesDuring = 0L
    val total = MatchScope.withTempMatchDir() { strategy =>
      dirUsed = strategy.dir
      val b = Materialize((1L to 500L).toDF("id"), strategy)
      filesDuring = Files.walk(Path.of(dirUsed))
        .filter(Files.isRegularFile(_)).count()
      b.agg(sum("id")).head().getLong(0)
    }
    assert(total == (1L to 500L).sum, "result must be consumable inside the scope")
    assert(filesDuring > 0, "Reliable barrier wrote no checkpoint files")
    assert(!Files.exists(Path.of(dirUsed)),
      s"temp match dir $dirUsed survived the scope — reference deletes it on exit")
  }

  test("full eager match under Reliable(dir) matches the Local-strategy result") {
    import graft.fuzzy._
    import spark.implicits._
    val left = (1 to 300).map(i => s"acme corp $i").toDF("name")
    val right = (1 to 200).map(i => s"acme corp ${i * 3}").toDF("company")
    val maps = Seq(FuzzyMapping("name", "company", thresholdScore = 80.0))

    val localRows = FuzzyMatcher.matchDfsEager(left, right, maps,
      MatchOptions()).count()

    var filesDuring = 0L
    val reliableRows = MatchScope.withTempMatchDir() { strategy =>
      val out = FuzzyMatcher.matchDfsEager(left, right, maps,
        MatchOptions(checkpoint = strategy))
      val n = out.count()
      filesDuring = Files.walk(Path.of(strategy.dir))
        .filter(Files.isRegularFile(_)).count()
      n
    }
    assert(reliableRows == localRows && localRows > 0,
      s"Reliable run returned $reliableRows rows, Local returned $localRows")
    // every pass barrier + index frames + the eager result -> real files
    assert(filesDuring > 0, "no checkpoint files written during the Reliable match")
  }

  test("Reliable barriers reuse one checkpoint uuid dir instead of re-seeding per call") {
    import spark.implicits._
    val ckptDir = Files.createTempDirectory("graft_reuse_ckpt")
    try {
      MatchScope.withMatchScope {
        val s = CheckpointStrategy.Reliable(ckptDir.toString)
        Materialize((1L to 10L).toDF("id"), s)
        Materialize((1L to 20L).toDF("id"), s)
        // setCheckpointDir creates one <uuid> child; both barriers share it
        val children = Files.list(ckptDir).count()
        assert(children == 1L,
          s"expected one shared uuid subdir, found $children (checkpoint dir re-seeded per barrier)")
      }
    } finally deleteRecursively(ckptDir)
  }
}
