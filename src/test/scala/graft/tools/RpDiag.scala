package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.{AnnSearch, Dedup, Embeddings}

/** Diagnostic: projected-space cosine vs true cosine on the embeddings
  * fixture — sanity for the JL composition. */
object RpDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    // raw projected values for vec 0
    val r0 = Embeddings.randomProject(emb.where(col("vec_id") === 0), "embedding", 64, 16)
      .select("rpvec").head().getSeq[Float](0)
    println(s"[rp] vec0 projected: ${r0.take(8).mkString(", ")}")

    // correlation between true and projected cosine over 2000 pairs
    val rp = Embeddings.randomProject(emb, "embedding", 64, 16)
    val a = rp.where(col("vec_id") < 40)
      .select(col("vec_id").as("ia"), col("embedding").as("va"), col("rpvec").as("ra"))
    val b = rp.where(col("vec_id") >= 40 && col("vec_id") < 90)
      .select(col("vec_id").as("ib"), col("embedding").as("vb"), col("rpvec").as("rb"))
    val pairs = a.crossJoin(b)
      .select(Dedup.cosineSimilarity(col("va"), col("vb")).as("ct"),
        Dedup.cosineSimilarity(col("ra"), col("rb")).as("cp"))
    pairs.select(corr(col("ct"), col("cp")).as("corr"),
      avg(abs(col("ct") - col("cp"))).as("mae")).show()

    // replicate the spec composition
    val queries = emb.where(col("vec_id") < 20)
    val exact = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rq = Embeddings.randomProject(queries, "embedding", 64, 16)
    val rc = Embeddings.randomProject(emb, "embedding", 64, 16)
    val cand = AnnSearch.bruteForceTopK(rq, rc, "rpvec", "vec_id", 50)
      .select(col("query_id"), col("corpus_id"))
    println(s"[rp] cand rows: ${cand.count()}")
    // candidate recall BEFORE re-rank: do true neighbors appear in cand?
    val candSet = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[rp] candidate recall: ${candSet.intersect(exact).size.toDouble / exact.size}")
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("__qv"))
    val cv = emb.select(col("vec_id").as("corpus_id"), col("embedding").as("__cv"))
    val rer = cand.join(qv, Seq("query_id")).join(cv, Seq("corpus_id"))
      .withColumn("cosine", Dedup.cosineSimilarity(col("__qv"), col("__cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("corpus_id").asc)
    val got = rer.withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[rp] rerank recall: ${got.intersect(exact).size.toDouble / exact.size}")
    spark.stop()
  }
}
