package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order clustering ([[ZOrder]]): kernel correctness and the
  * data-skipping property the layout exists for — a point predicate on the
  * SECONDARY key touches few files in a z-ordered layout but every file in
  * a primary-sorted layout.
  */
class ZOrderSpec extends AnyFunSuite with SparkSpec {

  test("interleave matches a bit-loop reference and is SQL-registered") {
    def slow(a: Long, b: Long): Long =
      (0 until 31).map(i => (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val cases = Seq((0L, 0L), (5L, 3L), (149L, 1706659032L),
      ((1L << 31) - 1, (1L << 31) - 1), (12345L, 67890L))
    cases.foreach { case (a, b) =>
      val got = spark.sql(s"SELECT z_value(${a}L, ${b}L)").head().getLong(0)
      assert(got === slow(a, b), s"z_value($a, $b)")
    }
    assert(spark.sql("SELECT z_value(5L, 3L)").head().getLong(0) === 27L)
  }

  test("z-value ordering is monotone in each key within the other's level") {
    // fixing b, larger a gives larger z (and symmetrically)
    import spark.implicits._
    val df = Seq.tabulate(64)(i => (i.toLong, 7L)).toDF("a", "b")
      .withColumn("z", ZOrder.zValue(col("a"), col("b")))
      .orderBy(col("a")).select("z").collect().map(_.getLong(0))
    assert(df.toSeq == df.toSeq.sorted)
  }

  test("z-ordered layout skips files on the secondary key; primary sort cannot") {
    val ev = graft.util.EventTs.loadEvents(spark, "/root/testdata/sf0.001")
      .withColumn("tsec", expr("ts div 1000000000"))
      .select(col("event_id"), col("user_id"), col("tsec"))
    val nFiles = 16
    val zdir = s"/tmp/graft_zorder_${System.nanoTime()}"
    val tdir = s"/tmp/graft_tsort_${System.nanoTime()}"
    ZOrder.writeClustered(ev, zdir, "tsec", "user_id", nFiles)
    // the naive layout: range-partitioned + sorted by time only
    ev.repartitionByRange(nFiles, col("tsec")).sortWithinPartitions(col("tsec"))
      .write.mode("overwrite").parquet(tdir)

    // per-file [min, max] coverage of user_id = what parquet row-group
    // stats would prune on a `user_id = probe` predicate
    def coveringFiles(dir: String, probe: Long): (Long, Long) = {
      val perFile = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("lo"), max("user_id").as("hi"))
      (perFile.where(col("lo") <= probe && col("hi") >= probe).count(), perFile.count())
    }
    // interior probes from the actual user population (extremes can be
    // absent from a file's [lo, hi] by chance even in a full-range file)
    val users = ev.select("user_id").distinct().orderBy(col("user_id"))
      .collect().map(_.getLong(0))
    val probes = Seq(users(users.length / 4), users(users.length / 2),
      users(3 * users.length / 4))
    val zCover = probes.map(p => coveringFiles(zdir, p)._1).sum
    val (tCover, tTotal) = {
      val c = probes.map(p => coveringFiles(tdir, p)); (c.map(_._1).sum, c.head._2)
    }
    // time-sorted files each span ~the full user range -> no skipping
    assert(tCover.toDouble >= 0.9 * probes.size * tTotal,
      s"expected the time-sorted layout to cover ~every file, covered $tCover")
    // z-ordered files are rectangles: most files skip any given user
    assert(zCover.toDouble < 0.5 * tCover,
      s"z-order covered $zCover file-probes vs time-sort $tCover; expected < half")
  }

  test("partially-null keys are rejected, empty frames write empty tables") {
    import spark.implicits._
    // min/max skip nulls, so a partially-null key column used to slip
    // through the all-null guard and get a NULL z-value silently
    val partial = Seq((Some(1L), 5L), (None, 6L), (Some(3L), 7L))
      .toDF("a", "b")
    val dir = s"/tmp/graft_znull_${System.nanoTime()}"
    val e = intercept[IllegalArgumentException] {
      ZOrder.writeClustered(partial, dir, "a", "b", 2)
    }
    assert(e.getMessage.contains("null"), e.getMessage)

    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ZOrder.writeClustered(empty, dir, "a", "b", 2) == (0L, 0L, 0L, 0L))
    assert(spark.read.parquet(dir).count() == 0)
  }
}
