package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-content sweep across the dedup families (the empty-input
  * specs cover the zero case; these cover the WORST non-empty cases a
  * 100 TB crawl actually contains): an all-identical corpus, single-token
  * documents, unicode (CJK / emoji / combining / RTL) text, and one
  * multi-MB document. Every family must return the provably right answer
  * — never OOM, never a wrong survivor set.
  */
class DedupAdversarialSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("all-identical corpus: every family collapses it to one survivor set") {
    val n = 50
    val docs = (1 to n).map(i => (i.toLong, "the same boilerplate passage repeated verbatim in every document of this corpus"))
      .toDF("doc_id", "text")

    // exact: one representative
    assert(Dedup.exactDedup(docs, "text", "doc_id").count() == 1L)

    // chunk: every distinct chunk survives once, owned by doc 1, dup_count=n
    val chunks = Dedup.chunkDedup(docs, "text", "doc_id", 4).collect()
    assert(chunks.nonEmpty && chunks.forall(r => r.getLong(0) == 1L && r.getLong(3) == n.toLong),
      s"chunk keep-first must own every chunk at doc 1 with dup_count=$n")

    // minhash: all C(n,2) pairs at jaccard 1.0 (identical shingle sets)
    val mh = Dedup.minhashLshPairs(docs, "text", "doc_id",
      shingleLen = 3, numBands = 8, rowsPerBand = 2, threshold = 0.9)
    assert(mh.count() == n.toLong * (n - 1) / 2, "identical docs must all pair")

    // winnow: every pair shares every fingerprint; confirm no blowup and
    // full pair coverage
    val wn = Dedup.winnowOverlapPairs(docs, "text", "doc_id",
      k = 3, window = 4, minShared = 1L)
    assert(wn.count() == n.toLong * (n - 1) / 2)

    // simhash: identical docs have identical signatures -> all pairs at
    // hamming distance 0
    val sh = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 0)
    assert(sh.count() == n.toLong * (n - 1) / 2)
  }

  test("single-token documents: chunking yields one chunk, families don't crash") {
    val docs = Seq((1L, "alpha"), (2L, "alpha"), (3L, "beta"), (4L, "y"))
      .toDF("doc_id", "text")

    val chunks = Dedup.chunkDedup(docs, "text", "doc_id", 16)
    // 3 distinct one-token chunk texts; "alpha" owned by doc 1, dup 2
    assert(chunks.count() == 3L)
    val alpha = chunks.where(col("dup_count") === 2).collect()
    assert(alpha.length == 1 && alpha.head.getLong(0) == 1L)

    // char-level shingling still fingerprints a single token: the two
    // identical "alpha" docs pair (jaccard 1.0), nothing else does
    val mh = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 8, 2, 0.5).collect()
    assert(mh.length == 1 && mh.head.getLong(0) == 1L && mh.head.getLong(1) == 2L)
    // winnow fingerprints the short token too: only the identical pair
    val wn = Dedup.winnowOverlapPairs(docs, "text", "doc_id", 3, 4, 1L).collect()
    assert(wn.length == 1 && wn.head.getLong(0) == 1L && wn.head.getLong(1) == 2L)
    // exact keeps one row per distinct text: the min-id alpha plus beta, y
    val ex = Dedup.exactDedupRows(docs, "text", "doc_id")
    assert(ex.count() == 3L &&
      ex.where(col("text") === "alpha").head().getLong(0) == 1L)
  }

  test("unicode text: digests are byte-faithful, rebuild round-trips exactly") {
    val cjk = "漢字 テスト 中文 処理 確認 データ 重複 排除 検証 完了"
    val emoji = "🚀 rocket 🧪 test 🚀 rocket 🧪 test ✨ done"
    val combining = "café naivë résumé café naivë"
    val rtl = "שלום עולם مرحبا بالعالم שלום עולם مرحبا بالعالم"
    val docs = Seq((1L, cjk), (2L, emoji), (3L, combining), (4L, rtl),
      // byte-twin check: precomposed vs combining é are DIFFERENT texts and
      // must NOT collapse (no silent normalization anywhere)
      (5L, "café naïve résumé café naïve"))
      .toDF("doc_id", "text")

    assert(Dedup.exactDedup(docs, "text", "doc_id").count() == 5L,
      "distinct unicode byte sequences must stay distinct")

    // rebuild: chunk + reassemble must reproduce each doc's exact text
    // (whitespace-tokenized corpora; every fixture is space-separated)
    val rebuilt = Dedup.chunkDedupRebuild(docs, "text", "doc_id", 3)
      .select(col("doc_id"), col("text_rebuilt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Map(1L -> cjk, 2L -> emoji, 3L -> combining, 4L -> rtl,
      5L -> "café naïve résumé café naïve")
    want.foreach { case (id, text) =>
      assert(rebuilt(id) == text, s"doc $id rebuild mismatch")
    }

    // near-dup families must process unicode shingles without error
    assert(Dedup.minhashLshPairs(docs, "text", "doc_id", 2, 8, 2, 0.3).count() >= 0L)
    assert(Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 16).count() >= 0L)
  }

  test("multi-MB single document: chunking scales linearly, no driver blowup") {
    // ~5 MB of text as ONE document: 1M distinct tokens
    val big = (0 until 1000000).map(i => java.lang.Integer.toString(i, 36))
      .mkString(" ")
    assert(big.length > 4 * 1024 * 1024)
    val docs = Seq((1L, big), (2L, "tiny doc")).toDF("doc_id", "text")

    val chunks = Dedup.chunkDedup(docs, "text", "doc_id", 512)
    val nChunks = chunks.count()
    // 1M tokens / 512 per chunk ~= 1954 chunks (+1 for the tiny doc)
    assert(nChunks >= 1950 && nChunks <= 1960, s"got $nChunks chunks")
    // all distinct (tokens are unique) -> every dup_count is 1
    assert(chunks.where(col("dup_count") =!= 1).count() == 0L)

    // fingerprinting the monster in one pass must not error
    assert(Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 3).count() == 0L)
  }
}
