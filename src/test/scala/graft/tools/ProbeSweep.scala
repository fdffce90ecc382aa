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
  * Launch: sbt "Test/runMain graft.tools.ProbeSweep [n=20] [load]"
  *
  * With the `load` argument the sweep forks its own synthetic I/O
  * contention (4 dd-style writer loops against /tmp, alive for the
  * sweep's duration) so the separation test is reproducible with one
  * command: healthy-band readings without `load`, gate-exceeding io
  * readings with it.
  */
object ProbeSweep {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.filter(_.forall(_.isDigit)).map(_.toInt).getOrElse(20)
    val withLoad = args.contains("load")
    val loaders =
      if (!withLoad) Seq.empty
      else (1 to 4).map { i =>
        val t = new Thread(() => {
          val buf = new Array[Byte](1 << 20)
          java.util.Arrays.fill(buf, 0x5a.toByte)
          val p = java.nio.file.Paths.get(s"/tmp/graft_sweep_load_$i")
          while (!Thread.currentThread().isInterrupted) {
            try {
              val ch = java.nio.channels.FileChannel.open(p,
                java.nio.file.StandardOpenOption.CREATE,
                java.nio.file.StandardOpenOption.WRITE,
                java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
              try {
                (1 to 512).foreach(_ => ch.write(java.nio.ByteBuffer.wrap(buf)))
                ch.force(true) // the fdatasync that makes the load real
              } finally ch.close()
            } catch { case _: java.nio.channels.ClosedByInterruptException => }
          }
          java.nio.file.Files.deleteIfExists(p)
        }, s"sweep-loader-$i")
        t.setDaemon(true); t.start(); t
      }
    if (withLoad) println(s"[sweep] synthetic I/O load: 4 x 512MB fsync'd writer loops")
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
    if (withLoad) {
      val over = os.count(_ > graft.Bench.IoProbeGateSec)
      println(s"[sweep] io readings over the ${graft.Bench.IoProbeGateSec} " +
        s"gate floor under load: $over/$n")
      loaders.foreach(_.interrupt())
    }
    graft.Bench.ioProbeCleanup()
    spark.stop()
  }
}
