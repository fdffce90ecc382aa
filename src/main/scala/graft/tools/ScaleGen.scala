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

  private def rotated(r: Int): String = {
    def rot(s: String, k: Int): String = s.drop(k % s.length) + s.take(k % s.length)
    rot("abcdefghijklmnopqrstuvwxyz", r) + rot("ABCDEFGHIJKLMNOPQRSTUVWXYZ", r) +
      rot("0123456789", r)
  }

  private def cipher(c: Column, r: Int): Column =
    if (r == 0) c else translate(c, Alphabet, rotated(r))

  /** Diagonal +-1 sign for dimension `i` of replica `r` — orthogonal, so
    * within-replica cosine structure is exactly preserved. */
  private def signFlip(vec: Column, r: Int): Column =
    if (r == 0) vec
    else transform(vec, (x, i) =>
      x * when(((i * 31 + lit(r) * 17) % 3) === 0, lit(-1.0f)).otherwise(lit(1.0f)))

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
    spark.stop()
  }
}
