package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JL random projection ([[Embeddings.randomProject]]): cosine structure
  * survives the projection well enough that reduced-space candidate
  * generation + full-dimension re-rank recovers the exact top-k — the
  * dimensionality-reduction search composition for corpus-scale ANN.
  */
class RandomProjectSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("projected vectors have outDim components, deterministic in the seed") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").limit(50)
    val a = Embeddings.randomProject(emb, "embedding", 64, 16).select("rpvec").collect()
    val b = Embeddings.randomProject(emb, "embedding", 64, 16).select("rpvec").collect()
    assert(a.forall(_.getSeq[Float](0).length == 16))
    assert(a.map(_.getSeq[Float](0)).toSeq == b.map(_.getSeq[Float](0)).toSeq)
    val other = Embeddings.randomProject(emb, "embedding", 64, 16, seed = 7L)
      .select("rpvec").collect()
    assert(a.map(_.getSeq[Float](0)).toSeq != other.map(_.getSeq[Float](0)).toSeq)
  }

  test("reduced-space candidates + exact re-rank recover the full top-k") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 20)
    val exact = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // candidate generation in 32 of 64 dimensions (half the data scanned;
    // the fixture's neighbor gaps are tiny relative to JL noise, so
    // halving — not quartering — is what keeps candidate recall high),
    // then the full-dimension cosine re-ranks only the 200 candidates
    val rq = Embeddings.randomProject(queries, "embedding", 64, 32)
    val rc = Embeddings.randomProject(emb, "embedding", 64, 32)
    val cand = AnnSearch.bruteForceTopK(rq, rc, "rpvec", "vec_id", 200)
      .select(col("query_id"), col("corpus_id"))
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("__qv"))
    val cv = emb.select(col("vec_id").as("corpus_id"), col("embedding").as("__cv"))
    val rer = cand.join(qv, Seq("query_id")).join(cv, Seq("corpus_id"))
      .withColumn("cosine", Dedup.cosineSimilarity(col("__qv"), col("__cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("corpus_id").asc)
    val got = rer.withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
      .select(col("query_id"), col("corpus_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"reduced-space recall $recall < 0.8")
  }

  test("md5-int variant matches the kernel's exact integer arithmetic") {
    // one vector computed by hand through the same quantization + planes
    val emb = spark.read.parquet(s"$dir/embeddings.parquet").where(col("vec_id") === 0)
    val got = Embeddings.randomProjectMd5Int(emb, "embedding", 64, 4)
      .select("rpq").head().getSeq[Long](0)
    val v = emb.select("embedding").head().getSeq[Float](0).toArray
    val planes = Dedup.hyperplanesMd5Int(64, 4)
    val want = (0 until 4).map { p =>
      (0 until 64).map(d => math.floor(v(d).toDouble * 4096.0).toLong * planes(p * 64 + d)).sum
    }
    assert(got == want)
  }
}
