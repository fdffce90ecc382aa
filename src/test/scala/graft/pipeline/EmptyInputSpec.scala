package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 operators on empty / degenerate inputs: a 100 TB pipeline WILL
  * see an empty partition-day, an all-blank document batch, or a query set
  * filtered to nothing — none of these may throw or return wrong shapes.
  */
class EmptyInputSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val emptyVecs =
    Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")

  test("chunk dedup family on empty and blank input") {
    assert(Dedup.chunkDedup(emptyDocs, "text", "doc_id", 16).count() === 0L)
    assert(Dedup.chunkDedupRebuild(emptyDocs, "text", "doc_id", 16).count() === 0L)
    // a whitespace-only document still yields its (single, empty) chunk
    val blank = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(Dedup.chunkDedup(blank, "text", "doc_id", 16).count() === 1L)
  }

  test("split and batch assignment on empty input") {
    val s = Curation.splitByHash(emptyDocs, "doc_id", Seq(("train", 1.0)))
    assert(s.columns.contains("split") && s.count() === 0L)
    val b = Curation.lengthBucketBatches(emptyDocs, "doc_id", "text", 32, 16)
    assert(b.count() === 0L)
  }

  test("olap wrappers on empty input") {
    val docs = Seq.empty[(String, String, Long)].toDF("lang", "source", "n_chars")
    // Spark's rollup emits NO rows on empty input (ANSI engines emit a
    // grand-total row) — pinned here, documented on the operator
    assert(Olap.rollupProfile(docs, Seq("lang", "source"), "n_chars").count() === 0L)
    assert(Olap.pivotCounts(docs, "source", "lang", Seq("en")).count() === 0L)
  }

  test("z-order writer handles an empty frame (empty table, no throw)") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val dir = s"/tmp/graft_zorder_empty_${System.nanoTime()}"
    val bounds = graft.util.ZOrder.writeClustered(empty, dir, "a", "b", 4)
    assert(bounds === ((0L, 0L, 0L, 0L)))
    assert(spark.read.parquet(dir).count() === 0L)
  }

  test("round-9 operators on empty and degenerate input") {
    // sharding and interleave: empty in, empty out, schema intact
    val sh = Curation.shuffleShard(emptyDocs, "doc_id", 8)
    assert(sh.columns.contains("shard") && sh.columns.contains("shard_pos"))
    assert(sh.count() === 0L)
    val emptySrc = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(Curation.interleaveShards(emptySrc, "doc_id", "source",
      Map("web" -> 1.0), 4).count() === 0L)
    // interleave where NO row matches the weighted sources: empty, no throw
    val docs = Seq((1L, "t", "src0")).toDF("doc_id", "text", "source")
    assert(Curation.interleaveShards(docs, "doc_id", "source",
      Map("absent" -> 1.0), 4).count() === 0L)
    // census: empty corpus and a corpus with nothing repeated
    assert(Dedup.ngramFrequency(emptyDocs, "text", "doc_id", 3, 2L).count() === 0L)
    assert(Dedup.boilerplateFlags(emptyDocs, "text", "doc_id", 3, 2L).count() === 0L)
    val uniq = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
    assert(Dedup.ngramFrequency(uniq, "text", "doc_id", 3, 2L).count() === 0L)
    assert(Dedup.boilerplateFlags(uniq, "text", "doc_id", 3, 2L).count() === 0L)
    // radius: empty query and empty corpus sides
    val vec = Seq((1L, Seq.fill(64)(1.0f))).toDF("vec_id", "embedding")
    assert(AnnSearch.bruteForceRadius(emptyVecs, vec, "embedding", "vec_id", 0.5)
      .count() === 0L)
    assert(AnnSearch.bruteForceRadius(vec, emptyVecs, "embedding", "vec_id", 0.5)
      .count() === 0L)
    assert(AnnSearch.lshRadius(vec, emptyVecs, "embedding", "vec_id", 0.5,
      dim = 64).count() === 0L)
    // AVI walker: empty payload sentinels
    val g = Multimodal.decodeAviMeta(
        Seq((1L, Array.empty[Byte])).toDF("doc_id", "payload"), "payload", "doc_id")
      .select($"usec_per_frame".as[Long]).head()
    assert(g === -1L)
  }

  test("int8 and projection search paths on empty sides") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(AnnSearch.int8TopK(emptyVecs, emb, "embedding", "vec_id", 5).count() === 0L)
    assert(AnnSearch.int8TopK(emb.limit(3), emptyVecs, "embedding", "vec_id", 5).count() === 0L)
    assert(Embeddings.randomProject(emptyVecs, "embedding", 64, 8).count() === 0L)
    // zero-length vectors quantize to zero-length arrays, excluded by norm
    val zeroDim = Seq((1L, Seq.empty[Float])).toDF("vec_id", "embedding")
    assert(AnnSearch.int8TopK(zeroDim, zeroDim, "embedding", "vec_id", 5).count() === 0L)
  }

  test("round-10 operators on empty and degenerate input") {
    // text filters: empty frame and empty text
    assert(TextAnalysis.gopherFlags(emptyDocs, "text", "doc_id").count() === 0L)
    assert(TextAnalysis.hashedLinearScore(emptyDocs, "text", "doc_id").count() === 0L)
    assert(TextAnalysis.pplBuckets(emptyDocs, "text", "doc_id").count() === 0L)
    assert(TextAnalysis.bpeVocab(emptyDocs, "text",
      Seq("t" -> "h")).count() === 0L)
    assert(Curation.cdcChunkDocs(emptyDocs, "text", "doc_id", 16).count() === 0L)
    assert(Curation.splitByDupGroup(emptyDocs, "text", "doc_id",
      Seq(("train", 1.0))).count() === 0L)
    assert(Dedup.duplicationStats(emptyDocs, "text", "doc_id", 16)
      .head().getAs[Long]("n_docs") === 0L)
    // PQ search on empty sides
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assert(AnnSearch.pqTopKInt(emptyVecs, emb, "embedding", "vec_id", 5,
      dim = 64).count() === 0L)
    assert(AnnSearch.pqTopKInt(emb.limit(3), emptyVecs, "embedding", "vec_id", 5,
      dim = 64).count() === 0L)
    // expectations on an empty frame: checks still report (row_count
    // catches the emptiness; others count zero violations)
    val rep = Profile.expectations(emptyDocs,
        Seq(Profile.ExpectNotNull("text"), Profile.ExpectRowCount(1L, 10L)))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(rep("not_null") == ((1L, 0L)))
    assert(rep("row_count") == ((0L, 1L)))
    // labeling on empty query side
    assert(AnnSearch.knnLabel(emptyVecs, emb.withColumn("label", lit(1)),
      "embedding", "vec_id", "label", 5).count() === 0L)
  }

  test("round-8-continuation operators on empty and degenerate input") {
    // pair families and the eval gate
    assert(Dedup.containmentPairs(emptyDocs, "text", "doc_id", 3, 0.5).count() === 0L)
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val ev = Dedup.evalPairs(emptyPairs, emptyPairs).head()
    assert(ev.getAs[Long]("n_pred") === 0L && ev.getAs[Double]("f1") === 0.0)
    // retrieval: empty corpus and empty query side
    val q = Seq((1L, "anything")).toDF("query_id", "qtext")
    assert(TextAnalysis.bm25TopK(emptyDocs, "text", "doc_id",
      q, "qtext", "query_id").count() === 0L)
    assert(TextAnalysis.bm25TopK(Seq((1L, "some words")).toDF("doc_id", "text"),
      "text", "doc_id", q.limit(0), "qtext", "query_id").count() === 0L)
    // sampling/weights on empty input
    assert(Curation.sampleExactN(emptyDocs, "doc_id", 5).count() === 0L)
    assert(Curation.dupWeights(emptyDocs, "text", "doc_id").count() === 0L)
    // correlation matrix on an empty frame: pairs emitted with sentinels
    val ecorr = Profile.correlations(
        Seq.empty[(Double, Double)].toDF("x", "y"), Seq("x", "y")).head()
    assert(ecorr.getAs[Long]("n") === 0L && ecorr.getAs[Double]("corr") === 0.0)
    // cube mirrors rollup's empty-input behavior (no rows, pinned)
    val docs3 = Seq.empty[(String, String, Long)].toDF("lang", "source", "n_chars")
    assert(Olap.cubeProfile(docs3, Seq("lang", "source"), "n_chars").count() === 0L)
    // markup strip: null stays null, empty stays empty
    val sm = Seq[Option[String]](None, Some(""), Some("<a>"))
      .toDF("text").select(TextAnalysis.stripMarkup(col("text"))).collect()
    assert(sm(0).isNullAt(0) && sm(1).getString(0) === "" && sm(2).getString(0) === "")
    // learned-classifier apply on an empty corpus (fit needs labels;
    // apply must tolerate nothing to score)
    val m = QualityModel.HashedModel(Array.fill(8)(0.0), 0.0, 8)
    assert(QualityModel.applyHashedModel(emptyDocs, "text", "doc_id", m)
      .count() === 0L)
  }

  test("span / diff / forget / filtered-search on empty and degenerate input") {
    // span rewrite: empty corpus, and a census built from an empty corpus
    assert(Dedup.spanRewrite(emptyDocs, "text", "doc_id", 3).count() === 0L)
    val emptyCensus = Dedup.ngramFrequency(emptyDocs, "text", "doc_id", 3, 1L)
    val batch = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val r = Dedup.spanRewriteAgainst(batch, emptyCensus, "text", "doc_id", 3)
      .head()
    assert(r.getAs[String]("text_clean") === "a b c d" &&
      r.getAs[Long]("n_removed") === 0L)
    // snapshot diff: both sides empty, one side empty
    assert(Curation.corpusDiff(emptyDocs, emptyDocs, "doc_id", Seq("text"))
      .count() === 0L)
    val only = Curation.corpusDiff(emptyDocs, batch, "doc_id", Seq("text"))
      .collect()
    assert(only.length === 1 && only.head.getAs[String]("status") === "added")
    // forget cascade: empty forget list leaves everything; empty parent
    val keepAll = Curation.forgetAudit(batch, "doc_id",
      emptyDocs.select("doc_id"), Seq(("c", batch, "doc_id"))).collect()
    assert(keepAll.forall(r2 => r2.getAs[Long]("forgotten") === 0L &&
      r2.getAs[Long]("orphans") === 0L))
    // an EMPTY artifact must audit as all-zero longs, never null (sum
    // over zero rows is null without the coalesce)
    val emptyChild = Curation.forgetAudit(batch, "doc_id",
        batch.select("doc_id"), Seq(("c", emptyDocs.select("doc_id"), "doc_id")))
      .collect().map(r2 => r2.getAs[String]("artifact") -> r2).toMap
    val ec = emptyChild("c")
    assert(!ec.isNullAt(ec.fieldIndex("forgotten")) &&
      ec.getAs[Long]("total") === 0L && ec.getAs[Long]("forgotten") === 0L &&
      ec.getAs[Long]("remaining") === 0L && ec.getAs[Long]("orphans") === 0L)
    // filtered search: empty query side
    val vecs = Seq((1L, Seq(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    assert(AnnSearch.filteredTopK(vecs.limit(0), vecs, "embedding", "vec_id",
      3, col("label") >= 0).count() === 0L)
    // mining/QA ops: empty inputs yield empty frames, not errors
    assert(AnnSearch.hardNegatives(vecs.limit(0), vecs, "embedding",
      "vec_id", "label", 3).count() === 0L)
    assert(AnnSearch.labelNoise(vecs.limit(0), "embedding", "vec_id",
      "label", 3).count() === 0L)
    // a single-label corpus has no possible negatives or disagreements
    assert(AnnSearch.hardNegatives(vecs, vecs, "embedding", "vec_id",
      "label", 3).count() === 0L)
    // drift on two empty snapshots still emits one all-zero row per column
    val dr = Profile.drift(emptyDocs, emptyDocs, Seq("text")).head()
    assert(dr.getAs[Long]("n_rows_old") === 0L && dr.getAs[String]("min_old") === "")
    // OOV against an empty vocab: every token is OOV, zero-doc frame is empty
    assert(TextAnalysis.oovRate(emptyDocs, "text", "doc_id",
      emptyDocs.select(col("text").as("token"))).count() === 0L)
  }

  test("round-10 selection / LM operators on empty and degenerate input") {
    val one = Seq((1L, "hello world")).toDF("doc_id", "text")
    // moore-lewis with an EMPTY in-domain set: every token OOV, scores 0
    val ml = TextAnalysis.mooreLewisScore(one, "text", "doc_id",
      emptyDocs, "text").head()
    assert(ml.getAs[Long]("n_scored") === 0L && ml.getAs[Double]("score") === 0.0)
    // and an empty corpus scores to an empty frame
    assert(TextAnalysis.mooreLewisScore(emptyDocs, "text", "doc_id",
      one, "text").count() === 0L)
    // KN with an empty train split: no continuations exist, everything
    // skips (never -inf), one row per doc with bigrams
    val kn = TextAnalysis.knBigramLogProb(one, "text", "doc_id",
      emptyDocs, "text").head()
    assert(kn.getAs[Long]("n_scored") === 0L && kn.getAs[Double]("logprob") === 0.0)
    // DSIR: empty target is legal (all-smoothing ratios, uniform ~0
    // weights); empty corpus selects nothing
    val m = Curation.dsirFit(one, "text", emptyDocs, "text", buckets = 64)
    assert(Curation.dsirScore(one, "text", "doc_id", m).count() === 1L)
    assert(Curation.dsirScore(emptyDocs, "text", "doc_id", m).count() === 0L)
    // unimax on an empty frame fails fast with the documented require
    intercept[IllegalArgumentException] {
      Curation.unimaxSample(emptyDocs, "doc_id", "text", 10L, 2)
    }
    // weighted exact-n: empty in, empty out
    assert(Curation.weightedSampleExactN(emptyDocs, "doc_id",
      lit(1.0), 5).count() === 0L)
  }

  test("round-13 hamming / curate / drift operators on empty and " +
    "degenerate input") {
    val emptyHashes = Seq.empty[(Long, Long)].toDF("id", "h")
    // self-join form: empty input, zero pairs, correct shape
    val hp = Dedup.hashPairs(emptyHashes, col("h"), "id", maxHamming = 3)
    assert(hp.columns.toSeq == Seq("id_a", "id_b", "hamming") && hp.count() === 0L)
    // incremental form: empty batch vs non-empty corpus, and the reverse
    val corpus = Seq((100L, 0xFFL)).toDF("id", "h")
    assert(Dedup.hashPairsAgainst(emptyHashes, col("h"), "id",
      corpus, col("h"), "id", maxHamming = 3).count() === 0L)
    assert(Dedup.hashPairsAgainst(corpus, col("h"), "id",
      emptyHashes, col("h"), "id", maxHamming = 3).count() === 0L)
    // a single row can never pair with itself (self-pair exclusion)
    assert(Dedup.hashPairsAgainst(corpus, col("h"), "id",
      corpus, col("h"), "id", maxHamming = 3).count() === 0L)
    // stored form: an empty batch touches zero buckets (isin() over an
    // empty list must yield an empty result, not throw)
    val storeDir = java.nio.file.Files.createTempDirectory("empty_hamstore").toString
    Dedup.saveHammingState(corpus, col("h"), "id", storeDir,
      maxHamming = 3, nBuckets = 4)
    assert(Dedup.hashPairsAgainstStored(emptyHashes, col("h"), "id",
      Dedup.loadHammingState(spark, storeDir)).count() === 0L)
    // a store saved from an EMPTY corpus must stay loadable (partitioned
    // writes of empty frames emit no schema-bearing files — the schema
    // table covers it) and searchable
    val emptyStore = java.nio.file.Files.createTempDirectory("empty_hamstore2").toString
    Dedup.saveHammingState(emptyHashes, col("h"), "id", emptyStore,
      maxHamming = 3, nBuckets = 4)
    assert(Dedup.hashPairsAgainstStored(corpus, col("h"), "id",
      Dedup.loadHammingState(spark, emptyStore)).count() === 0L)

    // curate: an empty corpus yields zero buckets in both modes
    val emptyKeyed = Seq.empty[(Long, Long)].toDF("doc_id", "img_key")
    assert(graft.pipeline.Multimodal.curateByDHash(
      emptyKeyed, "doc_id", "img_key").count() === 0L)
    assert(graft.pipeline.Multimodal.curateByDHash(
      emptyKeyed, "doc_id", "img_key", maxHamming = 2).count() === 0L)

    // drift tail: disjoint group sets -> inner join drops everything
    // (documented: Profile.drift is the appear/disappear tool)
    val a = Seq((0L, Seq(1.0f, 2.0f))).toDF("label", "embedding")
    val b = Seq((1L, Seq(1.0f, 2.0f))).toDF("label", "embedding")
    assert(Embeddings.centroidDrift(a, b, Seq("label"), "embedding").count() === 0L)
  }

  test("round-10 sketches and monitors on empty input") {
    val emptyKV = Seq.empty[(String, Long)].toDF("g", "v")
    assert(Profile.hllRegisters(emptyKV, "v", Seq("g"), p = 8).count() === 0L)
    assert(Profile.hllDistinct(emptyKV, "v", Seq("g"), p = 8).count() === 0L)
    assert(Profile.kmvSketch(emptyKV, "v", Seq("g"), k = 8).count() === 0L)
    assert(Profile.cmsCounters(emptyKV, "v", 4, 64).count() === 0L)
    // CMS lookup of anything against EMPTY counters: everything 0, no throw
    val est = Profile.cmsLookup(Profile.cmsCounters(emptyKV, "v", 4, 64),
      Seq(("g", 1L)).toDF("g", "v"), "v", 4, 64).head()
    assert(est.getLong(1) === 0L)
    assert(Profile.hdrBuckets(emptyKV, "v", Seq("g")).count() === 0L)
    // PSI of empty-vs-empty: no keys, no rows (nothing to drift)
    assert(Profile.psiCategorical(emptyDocs, emptyDocs, "text").count() === 0L)
    // PSI of something vs empty: one-sided keys still contribute finitely
    val oneSide = Profile.psiCategorical(
      Seq((1L, "en")).toDF("doc_id", "lang"), emptyDocs
        .select(col("doc_id"), col("text").as("lang")), "lang")
    assert(oneSide.count() === 1L &&
      !oneSide.head().getAs[Double]("psi_contrib").isNaN)
    // semantic dedup on an empty embedding frame: empty, no throw
    assert(Dedup.semDedup(emptyVecs, "embedding", "vec_id",
      DemoModels.SemCentroids, 64, 8, 0.35).count() === 0L)
    // MAD on a single-row group: med = the value, mad = 0, not an outlier
    val mad = Profile.madOutliers(Seq(("a", 1L, 5L)).toDF("g", "id", "v"),
      "g", "v").head()
    assert(mad.getAs[Boolean]("is_outlier") === false)
  }
}
