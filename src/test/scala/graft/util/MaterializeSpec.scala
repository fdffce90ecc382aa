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
}
