package graft.tools

import org.apache.spark.sql.SparkSession

/** Calibration sweep for the bench's two pre-sample probes
  * ([[graft.Bench.probeOnce]] CPU-bound, [[graft.Bench.ioProbeOnce]]
  * I/O-bound): N alternating readings on the current host, printed with
  * percentiles — run once on a quiet host to set the healthy bands /
  * gates, and again under synthetic contention (`dd`, `stress --io`,
  * a parallel verify run) to confirm the gates actually separate the
  * two regimes (SCALE.md "Bench self-certification").
  *
  * Launch: sbt "Test/runMain graft.tools.ProbeSweep [n=20]"
  */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT both probe plans before measuring
    graft.Bench.probeOnce(spark); graft.Bench.probeOnce(spark)
    graft.Bench.ioProbeOnce(spark); graft.Bench.ioProbeOnce(spark)
    val rows = (1 to n).map { i =>
      val c = graft.Bench.probeOnce(spark)
      val o = graft.Bench.ioProbeOnce(spark)
      println(f"[sweep] $i%3d  cpu=$c%.3f  io=$o%.3f")
      (c, o)
    }
    def pct(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted
      s(math.min(s.length - 1, (p * s.length).toInt))
    }
    val (cs, os) = (rows.map(_._1), rows.map(_._2))
    println(f"[sweep] cpu min=${cs.min}%.3f p50=${pct(cs, 0.5)}%.3f " +
      f"p90=${pct(cs, 0.9)}%.3f max=${cs.max}%.3f")
    println(f"[sweep] io  min=${os.min}%.3f p50=${pct(os, 0.5)}%.3f " +
      f"p90=${pct(os, 0.9)}%.3f max=${os.max}%.3f")
    spark.stop()
  }
}
