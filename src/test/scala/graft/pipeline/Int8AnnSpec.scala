package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Int8 embedding quantization ([[Embeddings.quantizeInt8]]) and the
  * quantized search path ([[AnnSearch.int8TopK]]): quantization bounds and
  * reconstruction error, recall vs the float-cosine baseline, and the SQL
  * registration of the kernels.
  */
class Int8AnnSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("quantized components are bounded and reconstruct within one step") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = Embeddings.quantizeInt8(emb, "embedding")
    val bad = q.select(explode(arrays_zip(col("embedding"), col("qvec"))).as("z"),
        col("scale"))
      .select(col("z.embedding").cast("double").as("v"),
        col("z.qvec").cast("long").as("q"), col("scale"))
      // |q| <= 127, and q*scale under-estimates v by at most one floor step
      .where(abs(col("q")) > 127 ||
        (col("scale") > 0 &&
          (col("v") - col("q") * col("scale") < 0 ||
           col("v") - col("q") * col("scale") >= col("scale"))))
      .count()
    assert(bad === 0L)
  }

  test("all-zero vectors quantize to all zeros and are excluded from search") {
    import spark.implicits._
    val df = Seq((1L, Seq(0f, 0f, 0f)), (2L, Seq(1f, 0f, -1f)), (3L, Seq(0.5f, 0.25f, 0f)))
      .toDF("vec_id", "embedding")
    val q = Embeddings.quantizeInt8(df, "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](2)).toMap
    assert(q(1L) === Seq[Byte](0, 0, 0))
    assert(q(2L) === Seq[Byte](127, 0, -127))
    val res = AnnSearch.int8TopK(df, df, "embedding", "vec_id", 5)
    // the zero vector appears neither as query nor as corpus candidate
    assert(res.where(col("query_id") === 1L || col("corpus_id") === 1L).count() === 0L)
    assert(res.where(col("query_id") === 2L).count() === 1L)
  }

  test("int8 top-k recall vs float brute force") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 20)
    val brute = AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val i8 = AnnSearch.int8TopK(queries, emb, "embedding", "vec_id", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    val recall = i8.intersect(brute).size.toDouble / brute.size
    // per-vector scaling cancels in the cosine; the only error is the floor
    // step (~1/254 of the dynamic range per component)
    assert(recall >= 0.9, s"int8 recall $recall < 0.9")
  }

  test("quantized cosine tracks the float cosine within quantization error") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
    val i8 = AnnSearch.int8TopK(queries, emb, "embedding", "vec_id", 10)
    val joined = i8.join(
      AnnSearch.bruteForceTopK(queries, emb, "embedding", "vec_id", 1000),
      Seq("query_id", "corpus_id"))
    val maxErr = joined.agg(max(abs(col("qcosine") - col("cosine")))).head().getDouble(0)
    assert(maxErr < 0.05, s"max |qcos - cos| = $maxErr")
  }

  test("full-probe IVF with int8 re-rank equals brute-force int8 search") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 20)
    val brute = AnnSearch.int8TopK(queries, emb, "embedding", "vec_id", 10)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivf = AnnSearch.ivfTopK(queries, emb, "embedding", "vec_id", 10,
        dim = 64, nCells = 8, nProbe = 8, iters = 3, int8Rerank = true)
      .select("query_id", "corpus_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty && ivf === brute)
  }

  test("partial-probe int8 IVF keeps recall vs its own full probe") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 20)
    def at(nProbe: Int) = AnnSearch.ivfTopK(queries, emb, "embedding", "vec_id", 10,
        dim = 64, nCells = 8, nProbe = nProbe, iters = 3, int8Rerank = true)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = at(8)
    val part = at(4)
    assert(part.intersect(full).size.toDouble / full.size >= 0.5)
  }

  test("i8vec kernels are SQL-registered") {
    val one = spark.sql(
      """SELECT i8vec_dot(i8vec_quantize(array(CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT))),
                          i8vec_quantize(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)))) AS d""")
      .head().getLong(0)
    // q(1.0, -0.5) = (127, -64); q(1.0, 0.5) = (127, 63): dot = 16129 - 4032
    assert(one === 127L * 127L + (-64L) * 63L)
  }
}
