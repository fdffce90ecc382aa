package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesizes an sf1.0-scale corpus (10x the largest driver-provided
  * scale factor) for the scale-validation run, WITHOUT touching the
  * read-only testdata: each output table is `replicas` bijective
  * character-cipher images of the sf0.1 base, ids offset per replica.
  *
  * Why a cipher (rotate a-z / A-Z / 0-9 by the replica index): it is a
  * bijection on the value alphabet, so every WITHIN-replica relation the
  * benchmarks measure — value uniqueness, edit distances, shingle sets,
  * chunk digests, group sizes — is preserved exactly, while CROSS-replica
  * similarity is destroyed (every letter differs for r > 0: no fuzzy
  * matches at any threshold under 1.0, shingle jaccard ~0, distinct
  * values multiply by `replicas`). The result scales every workload the
  * honest way: 10x values, 10x linear work, 100x cartesian pairs.
  * Embedding replicas apply a per-replica diagonal +-1 (orthogonal)
  * transform instead: within-replica cosines are bit-preserved,
  * cross-replica vectors decorrelate.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <outDir> [replicas=10]
  */
object ScaleGen {

  private val Alphabet =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

  /** Affine cipher i -> (a*i + b) mod n per character class — a pure
    * rotation (a = 1) only covers 26 distinct lowercase images, so
    * replicas 26 apart would share IDENTICAL letter text (digit-free
    * documents would exactly duplicate and corrupt every dedup row at
    * 100 replicas). Cycling the multiplier through the units of the
    * class size extends distinct lowercase ciphers to 12 x 26 = 312.
    * LETTER ciphers keep a = 1 for r < 26, but the DIGIT multiplier
    * cycles every 10 replicas (dmul switches to 3 at r = 10), so only
    * replicas 0-9 are bit-identical to a pure-rotation generator —
    * regenerate rather than mix fixtures across generator versions.
    * Cross-replica: same-multiplier pairs share zero
    * letters, different-multiplier pairs agree on <= 2 of 26 — far
    * below any fuzzy threshold or shingle collision. */
  private def affine(s: String, a: Int, b: Int): String = {
    val n = s.length
    (0 until n).map(i => s((a * i + b) % n)).mkString
  }

  private def rotated(r: Int): String = {
    val lmul = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
    val dmul = Seq(1, 3, 7, 9)
    affine("abcdefghijklmnopqrstuvwxyz", lmul((r / 26) % 12), r % 26) +
      affine("ABCDEFGHIJKLMNOPQRSTUVWXYZ", lmul((r / 26) % 12), r % 26) +
      affine("0123456789", dmul((r / 10) % 4), r % 10)
  }

  private def cipher(c: Column, r: Int): Column =
    if (r == 0) c else translate(c, Alphabet, rotated(r))

  /** Diagonal +-1 sign for dimension `i` of replica `r` — orthogonal, so
    * within-replica cosine structure is exactly preserved. The pattern
    * mixes r mod a prime > any replica count: a simple `(i + r*k) % 3`
    * would repeat every 3 replicas and exactly duplicate vectors. */
  private def signFlip(vec: Column, r: Int): Column =
    if (r == 0) vec
    else transform(vec, (x, i) =>
      x * when((((i + 1) * (lit(r) + 1)) % 101 % 2) === 0, lit(-1.0f)).otherwise(lit(1.0f)))

  private def replicate(base: DataFrame, replicas: Int)(one: Int => DataFrame): DataFrame =
    (0 until replicas).map(one).reduce(_ unionAll _)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val replicas = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, replicas)
    spark.stop()
  }

  /** Session-preserving body of [[main]] — callable from a live session
    * (the bench's sf1 tier regenerates a stale corpus in-process). */
  def generate(spark: SparkSession, src: String, out: String,
               replicas: Int): Unit = {
    val customer = spark.read.parquet(s"$src/customer.parquet")
    replicate(customer, replicas) { r =>
      customer.select(
        (col("c_custkey") + r * 10_000_000L).as("c_custkey"),
        cipher(col("c_name"), r).as("c_name"),
        col("c_nationkey"), col("c_acctbal"),
        cipher(col("c_mktsegment"), r).as("c_mktsegment"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/customer.parquet")

    val documents = spark.read.parquet(s"$src/documents.parquet")
    replicate(documents, replicas) { r =>
      documents.select(
        (col("doc_id") + r * 10_000_000L).as("doc_id"),
        cipher(col("text"), r).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")

    val embeddings = spark.read.parquet(s"$src/embeddings.parquet")
    replicate(embeddings, replicas) { r =>
      embeddings.select(
        (col("vec_id") + r * 10_000_000L).as("vec_id"),
        signFlip(col("embedding"), r).as("embedding"),
        col("label"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val events = spark.read.parquet(s"$src/events.parquet")
    replicate(events, replicas) { r =>
      events.select(
        (col("event_id") + r * 1_000_000_000L).as("event_id"),
        col("ts"),
        (col("user_id") + r * 10_000_000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.repartition(32).write.mode("overwrite").parquet(s"$out/events.parquet")

    Seq("customer", "documents", "embeddings", "events").foreach { t =>
      println(s"[scalegen] $t: " +
        spark.read.parquet(s"$out/$t.parquet").count() + " rows")
    }
  }
}
