package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fuzzy.{vectorFunctions, functions => ff, FuzzyAlgorithm}

/** Shape A/B for the exact scoring join: decomposes the per-pair cost of
  * the 9e8-pair customer-name cross join into iteration + gate + kernel,
  * to decide whether further join-shape work (e.g. keeping string reads
  * out of the eagerly-evaluated join condition) has anything left to buy.
  *
  *   v_iter   cross join + trivial long compare (iteration floor)
  *   v_gate   cross join + mask gate only (no kernel)
  *   v_kern   cross join + kernel only (no gate — the pre-mask shape)
  *   v_both   cross join + CASE(gate, kernel) (the shipped shape)
  */
object GateShapeAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[gate-ab] $name%-10s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    val c = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")
      .where(col("c_custkey") < 30000)
    def side(n: String): DataFrame = c.select(col("c_name").as(n)).distinct()
      .withColumn(s"__l$n", lower(col(n)))
      .withColumn(s"__m$n", vectorFunctions.char_mask(col(s"__l$n")))
      .withColumn(s"__k$n", floor(lit(0.1) * length(col(s"__l$n"))).cast("long"))
      .repartition(32).localCheckpoint()
    val l = side("a")
    val r = side("b")
    println(s"sides: ${l.count()} x ${r.count()}")
    val base = l.crossJoin(broadcast(r))
    val gate = bit_count(col("__ma").bitwiseXOR(col("__mb"))) >
      lit(2L) * greatest(col("__ka"), col("__kb"))
    val kern = ff.fuzzy_dist_bounded(col("__la"), col("__lb"),
      FuzzyAlgorithm.Levenshtein, 0.1)
    for (rep <- 1 to 2) {
      t(s"v_iter#$rep") { base.where(col("__ka") >= col("__kb")).count() }
      t(s"v_gate#$rep") { base.where(!gate).count() }
      t(s"v_kern#$rep") { base.where(kern <= 0.1).count() }
      t(s"v_both#$rep") { base.where(when(gate, lit(2.0)).otherwise(kern) <= 0.1).count() }
    }
    // r20: the broadcast sweep replacing the BNLJ shape — same corpus, same
    // gates + kernel, iteration over flat length-sorted arrays instead of
    // the codegen'd join loop. v_both is its direct baseline; survivor
    // parity with the BNLJ + filter(<=0.1) shape is asserted.
    val bnljSurvivors = base
      .where(when(gate, lit(2.0)).otherwise(kern) <= 0.1).count()
    for (rep <- 1 to 2) {
      t(s"v_sweep#$rep") {
        val n = graft.fuzzy.SweepScore.sweepScoredPairs(
          l.select(col("a")), r.select(col("b")), "a", "b", 0.1).count()
        assert(n == bnljSurvivors, s"sweep=$n bnlj=$bnljSurvivors")
        n
      }
    }
    spark.stop()
  }
}
