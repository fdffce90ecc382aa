package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hashSample is deterministic, proportional, and nested across fractions") {
    val s10 = Curation.hashSample(docs, "doc_id", 0.10).select("doc_id").as[Long].collect().toSet
    val s25 = Curation.hashSample(docs, "doc_id", 0.25).select("doc_id").as[Long].collect().toSet
    val total = docs.count().toDouble
    // md5 buckets are uniform: expect fraction +- a loose binomial bound
    assert(math.abs(s10.size / total - 0.10) < 0.06, s"10% sample kept ${s10.size} of $total")
    assert(math.abs(s25.size / total - 0.25) < 0.08, s"25% sample kept ${s25.size} of $total")
    // thresholded hash => smaller fractions are strict subsets (resumable
    // down-sampling: shrinking the corpus never picks NEW documents)
    assert(s10.subsetOf(s25))
    // rerun is identical (no RNG state anywhere)
    assert(Curation.hashSample(docs, "doc_id", 0.10).select("doc_id")
      .as[Long].collect().toSet == s10)
    // boundary fractions
    assert(Curation.hashSample(docs, "doc_id", 0.0).count() == 0)
    assert(Curation.hashSample(docs, "doc_id", 1.0).count() == total.toLong)
  }

  test("sampleExactN: exact count, md5-smallest order, deterministic") {
    val d = (1L to 300L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val got = Curation.sampleExactN(d, "doc_id", 50)
      .orderBy(col("sample_rank")).select("doc_id").as[Long].collect().toSeq
    assert(got.size == 50)
    // reference: the same 52-bit key ordered by (key, id) with a sort
    val ref = d.select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("long").as("k"))
      .orderBy(col("k"), col("doc_id")).limit(50)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == ref)
    // rerun identical; n >= corpus keeps every row (ranked)
    val rerun = Curation.sampleExactN(d, "doc_id", 50)
      .orderBy(col("sample_rank")).select("doc_id").as[Long].collect().toSeq
    assert(rerun == got)
    assert(Curation.sampleExactN(d, "doc_id", 500).count() == 300L)
    // original columns survive the re-attach join
    assert(Curation.sampleExactN(d, "doc_id", 5).columns.toSet ==
      Set("doc_id", "text", "sample_rank"))
  }

  test("dupWeights: 1/n per exact-dup class; weightsByGroup per cluster") {
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, "unique here"))
      .toDF("doc_id", "text")
    val w = Curation.dupWeights(d, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_copies"), r.getAs[Double]("weight")))).toMap
    assert(w(1L) == ((2L, 0.5)) && w(2L) == ((2L, 0.5)) && w(3L) == ((1L, 1.0)))
    // total weight = number of distinct texts
    assert(math.abs(w.values.map(_._2).sum - 2.0) < 1e-9)
    val g = Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 9L)).toDF("id", "cluster")
    val gw = Curation.weightsByGroup(g, "cluster")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("weight")).toMap
    assert(gw(1L) == 0.333333 && gw(4L) == 1.0)
  }

  test("dupWeights/weightsByGroup/splitByDupGroup keep NULL-key rows " +
    "(one class of their own) instead of dropping them at the join-back") {
    val d = Seq((1L, "same"), (2L, "same"), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val w = Curation.dupWeights(d, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_copies"), r.getAs[Double]("weight")))).toMap
    assert(w.keySet == Set(1L, 2L, 3L, 4L, 5L), s"rows dropped: ${w.keySet}")
    assert(w(3L) == ((3L, 0.333333)) && w(4L) == w(3L) && w(5L) == w(3L))

    val g = Seq((1L, java.lang.Long.valueOf(7L)),
      (2L, null.asInstanceOf[java.lang.Long]),
      (3L, null.asInstanceOf[java.lang.Long])).toDF("id", "cluster")
    val gw = Curation.weightsByGroup(g, "cluster")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("weight")).toMap
    assert(gw.keySet == Set(1L, 2L, 3L) && gw(1L) == 1.0 && gw(2L) == 0.5)

    val sp = Curation.splitByDupGroup(d, "text", "doc_id",
      Seq(("train", 0.8), ("eval", 0.2)))
    assert(sp.count() == 5L, "splitByDupGroup dropped null-text rows")
    // all null-text rows share one group -> identical split
    assert(sp.where(col("text").isNull).select("split").distinct().count() == 1L)
  }

  test("temperatureSample: rarest stratum keeps all, alpha=1 keeps " +
    "everything, null strata sample at their own rate") {
    val d = ((1 to 800).map(i => (i.toLong, "en")) ++
      (801 to 1000).map(i => (i.toLong, "fr")) ++
      (1001 to 1050).map(i => (i.toLong, null.asInstanceOf[String])))
      .toDF("doc_id", "lang")
    val s = Curation.temperatureSample(d, "doc_id", "lang", 0.5)
    val rates = s.groupBy("lang").agg(
        org.apache.spark.sql.functions.max("keep_rate").as("r"),
        count(lit(1)).as("kept"))
      .collect().map(r => Option(r.getString(0)) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // rarest stratum (the 50 nulls) keeps everything at rate 1.0
    assert(rates(None)._1 == 1.0 && rates(None)._2 == 50L, s"$rates")
    // en: (800/50)^-0.5 = 0.25 exactly
    assert(math.abs(rates(Some("en"))._1 - 0.25) < 1e-9)
    assert(math.abs(rates(Some("fr"))._1 - 0.5) < 1e-9)
    // expected kept ~ rate * n (md5 buckets are uniform; generous bounds)
    assert(rates(Some("en"))._2 > 120 && rates(Some("en"))._2 < 280, s"$rates")
    // alpha = 1: every rate is 1, every row survives
    assert(Curation.temperatureSample(d, "doc_id", "lang", 1.0).count() == 1050L)
  }

  test("temperatureSample fails fast on a high-cardinality stratum column " +
    "with a message naming the broadcast-join alternative") {
    // a doc-id-as-stratum mistake: 50 distinct values against a cap of 10
    val d = (1 to 50).map(i => (i.toLong, s"s$i")).toDF("doc_id", "src")
    val e = intercept[IllegalArgumentException] {
      Curation.temperatureSample(d, "doc_id", "src", 0.5, maxStrata = 10)
    }
    assert(e.getMessage.contains("over 10 distinct values"), e.getMessage)
    assert(e.getMessage.contains("broadcast-join"), e.getMessage)
    // at the cap it still works (bounded collect, not a behavior change)
    assert(Curation.temperatureSample(d.where(col("doc_id") <= 10),
      "doc_id", "src", 1.0, maxStrata = 10).count() == 10L)
  }

  test("stratifiedHashSample rejects a pathological rate map") {
    val d = (1 to 5).map(i => (i.toLong, s"s$i")).toDF("doc_id", "src")
    val big = (1 to 1001).map(i => s"s$i" -> 0.5).toMap
    val e = intercept[IllegalArgumentException] {
      Curation.stratifiedHashSample(d, "doc_id", "src", big, 1.0)
    }
    assert(e.getMessage.contains("broadcast-join"), e.getMessage)
  }

  test("sampleExactNPerStratum: exactly n per stratum (all rows when a " +
    "stratum is smaller), null strata are their own stratum, ranks are " +
    "the global sampler's order restricted to the stratum") {
    val d = ((1 to 100).map(i => (i.toLong, "en")) ++
      (101 to 130).map(i => (i.toLong, "fr")) ++
      (131 to 133).map(i => (i.toLong, null.asInstanceOf[String])))
      .toDF("doc_id", "lang")
    val got = Curation.sampleExactNPerStratum(d, "doc_id", "lang", 10)
      .collect().map(r => (Option(r.getAs[String]("lang")),
        r.getAs[Long]("doc_id"), r.getAs[Int]("sample_rank")))
    val bySt = got.groupBy(_._1)
    assert(bySt(Some("en")).length == 10 && bySt(Some("fr")).length == 10)
    // the 3-row null stratum keeps everything, ranked 1..3
    assert(bySt(None).map(_._3).sorted.toSeq == Seq(1, 2, 3))
    // within each stratum the ranks are 1..n and follow the same md5
    // order the global sampler uses
    bySt.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    val enGlobal = Curation.sampleExactN(
        d.where(col("lang") === "en"), "doc_id", 10)
      .select("doc_id", "sample_rank").as[(Long, Int)].collect().toSet
    assert(bySt(Some("en")).map(t => (t._2, t._3)).toSet == enGlobal)
  }

  test("sampleExactN accepts an INT id column (casts to long for the heap)") {
    val d = (1 to 100).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val got = Curation.sampleExactN(d, "doc_id", 10)
    assert(got.count() == 10L)
    // same picks as the long-id frame (md5 of the string form is equal)
    val asLong = Curation.sampleExactN(
      (1L to 100L).map(i => (i, s"doc$i")).toDF("doc_id", "text"), "doc_id", 10)
    assert(got.select("doc_id").as[Long].collect().toSet ==
      asLong.select("doc_id").as[Long].collect().toSet)
  }

  test("stratifiedHashSample applies per-stratum rates with a default") {
    val sampled = Curation.stratifiedHashSample(docs, "doc_id", "source",
      Map("books" -> 1.0, "web" -> 0.0), defaultRate = 0.5)
    val bySource = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.getOrElse("books", 0L) == totals.getOrElse("books", 0L),
      "rate 1.0 must keep every row of its stratum")
    assert(!bySource.contains("web"), "rate 0.0 must drop the whole stratum")
    // individual strata are tiny at sf0.001 — test the default rate over
    // their union, where the binomial bound is meaningful
    val others = totals.keys.filterNot(Set("books", "web")).toSeq
    val keptDefault = others.map(s => bySource.getOrElse(s, 0L)).sum.toDouble
    val totalDefault = others.map(totals).sum.toDouble
    assert(totalDefault > 0)
    assert(math.abs(keptDefault / totalDefault - 0.5) < 0.1,
      s"default-rate strata kept ${keptDefault / totalDefault}")
  }

  test("topKPerGroup keeps exactly k rows per group with deterministic ties") {
    val df = Seq(
      ("a", 1L, 0.9), ("a", 2L, 0.9), ("a", 3L, 0.5), ("a", 4L, 0.1),
      ("b", 5L, 0.7), ("b", 6L, 0.8)).toDF("g", "id", "score")
    val top = Curation.topKPerGroup(df, "g", col("score"), 2, col("id"))
      .select("g", "id", "rank").collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    // tie at 0.9 breaks on the smaller id; ranks are dense per group
    assert(top.toSet == Set(("a", 1L, 1), ("a", 2L, 2), ("b", 6L, 1), ("b", 5L, 2)))
  }

  test("vocabulary counts tokens corpus-wide and applies minCount") {
    val df = Seq("the cat the dog", "THE  cat", "", "bird").toDF("text")
    val vocab = Curation.vocabulary(df, "text", minCount = 2L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab == Map("the" -> 3L, "cat" -> 2L))
  }

  test("packSequences: contiguous offsets per shard, bounded overhang, sharded window") {
    val packed = Curation.packSequences(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), budgetTokens = 512L, numShards = 4)
      .withColumn("tok", TextAnalysis.tokenCount(col("text")).cast("long"))
      .select("doc_id", "shard", "pack_off", "pack_id", "tok")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(packed.length == docs.count())
    // window parallelism: documents actually spread over the shards
    assert(packed.map(_._2).distinct.length == 4)
    packed.groupBy(_._2).foreach { case (_, rows) =>
      val byId = rows.sortBy(_._1)
      // offsets are the exclusive running sum in id order
      var expectedOff = 0L
      byId.foreach { case (id, _, off, _, tok) =>
        assert(off == expectedOff, s"doc $id offset $off != running sum $expectedOff")
        expectedOff += tok
      }
      // a pack never exceeds budget + one document's overhang: every doc's
      // START offset lies inside its pack's budget window
      byId.foreach { case (id, shard, off, pack, _) =>
        assert(pack == shard * 2147483648L + off / 512L, s"doc $id pack id mismatch")
      }
    }
    // determinism across runs
    val again = Curation.packSequences(docs, "doc_id",
        TextAnalysis.tokenCount(col("text")), 512L, 4)
      .select("doc_id", "pack_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == packed.map(p => (p._1, p._4)).toSet)
  }

  test("hashSampleN keeps exactly n per group, deterministically") {
    val sampled = Curation.hashSampleN(docs, "doc_id", "source", 5)
    val counts = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (src, tot) =>
      assert(counts(src) == math.min(5L, tot), s"$src: ${counts.get(src)} of $tot")
    }
    assert(sampled.columns.toSeq == docs.columns.toSeq, "full schema passes through")
    val again = Curation.hashSampleN(docs, "doc_id", "source", 5)
      .select("doc_id").as[Long].collect().toSet
    assert(again == sampled.select("doc_id").as[Long].collect().toSet)
  }

  test("chunkTokens: overlapping windows cover the document exactly") {
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    // chunk 4, overlap 2 -> stride 2 -> starts 0,2,4,6,8 (5 chunks for 10)
    val rows = Curation.chunkTokens(d, "text", "doc_id", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3)))).toMap
    assert(rows.count(_._1._1 == 1L) == 5)
    assert(rows((1L, 0L)) == ((4L, "t1 t2 t3 t4")))
    assert(rows((1L, 1L)) == ((4L, "t3 t4 t5 t6")))
    assert(rows((1L, 4L)) == ((2L, "t9 t10")), "last chunk may be short")
    // neighbors overlap by exactly `overlap` tokens
    assert(rows((1L, 0L))._2.split(" ").takeRight(2).toSeq ==
      rows((1L, 1L))._2.split(" ").take(2).toSeq)
    assert(rows.count(_._1._1 == 2L) == 1 && rows((2L, 0L)) == ((2L, "a b")),
      "short docs yield one chunk")
  }

  test("aboveGroupPercentile keeps rows at/above each group's threshold") {
    import spark.implicits._
    // group g: 10,20,30,40 -> median 25 -> keeps 30,40; h: 7 -> keeps 7
    val df = Seq(("g", 10), ("g", 20), ("g", 30), ("g", 40), ("h", 7))
      .toDF("grp", "n")
    val kept = Curation.aboveGroupPercentile(df, "grp", "n", 0.5)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(kept == Set(("g", 30), ("g", 40), ("h", 7)), s"got $kept")
    assert(Curation.aboveGroupPercentile(df, "grp", "n", 0.0).count() == 5,
      "p=0 keeps everything")
    // a NULL group is still a group: its rows filter against their own
    // percentile instead of silently vanishing in the join
    val withNull = Seq((Some("g"), 10), (None, 1), (None, 3))
      .toDF("grp", "n")
    val keptNull = Curation.aboveGroupPercentile(withNull, "grp", "n", 0.5)
      .collect().map(r => (Option(r.getString(0)), r.getInt(1))).toSet
    assert(keptNull == Set((Some("g"), 10), (None, 3)), s"got $keptNull")
  }

  test("bpePairCounts counts adjacent-pair occurrences corpus-wide") {
    val d = Seq("a b a b c", "a b", "solo", "").toDF("text")
    val m = Curation.bpePairCounts(d, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "a b a b c": (a b)x2, (b a), (b c); "a b": (a b); singles/empty: none
    assert(m == Map("a b" -> 3L, "b a" -> 1L, "b c" -> 1L), s"got $m")
    assert(Curation.bpePairCounts(d, "text", minCount = 2L)
      .collect().map(_.getString(0)).toSeq == Seq("a b"))
  }

  test("corpusStats: exact interpolated percentiles per group") {
    import spark.implicits._
    // group g has sizes 10,20,30,40 -> p50 = 25 (interpolated), p90 = 37
    val df = Seq(("g", 10), ("g", 20), ("g", 30), ("g", 40), ("h", 7))
      .toDF("grp", "n")
    val rows = Curation.corpusStats(df, Seq("grp"), "n").collect()
      .map(r => r.getString(0) -> r).toMap
    val g = rows("g")
    assert(g.getLong(1) == 4L && g.getLong(2) == 100L)       // n_docs, total
    assert(g.getDouble(3) == 25.0)                            // mean
    assert(g.getDouble(4) == 25.0, s"p50 ${g.getDouble(4)}")  // (20+30)/2
    assert(g.getDouble(5) == 37.0, s"p90 ${g.getDouble(5)}")  // 30 + 0.7*10
    assert(g.getLong(6) == 10L && g.getLong(7) == 40L)        // min, max
    val h = rows("h")
    assert(h.getLong(1) == 1L && h.getDouble(4) == 7.0 && h.getDouble(5) == 7.0,
      "a singleton group's percentiles are its value")
  }

  test("winsorize keeps NULL measurements NULL (no clamp-to-lo fabrication)") {
    val df = Seq(("a", "g", Some(1.0)), ("b", "g", Some(10.0)),
      ("c", "g", Some(100.0)), ("d", "g", None))
      .toDF("id", "grp", "x")
    val out = Curation.winsorize(df, "grp", "x", 0.25, 0.75)
      .select("id", "winsorized").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(out("d") == null, s"NULL input winsorized to ${out("d")} — must stay NULL")
    // non-null rows still clamp (row count preserved: d is present, just NULL)
    assert(out.size == 4 && out("a") != null && out("c") != null)
  }

  test("shuffleShard: balanced shards, contiguous positions, deterministic") {
    val n = docs.count()
    val out = Curation.shuffleShard(docs, "doc_id", 8)
      .select($"doc_id".as[Long], $"shard".as[Long], $"shard_pos".as[Long])
      .collect()
    assert(out.length == n, "sharding must not add or drop rows")
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    // md5 uniformity: no shard more than 2x the fair share on this fixture
    val fair = n.toDouble / 8
    byShard.foreach { case (s, rows) =>
      assert(rows.length < fair * 2, s"shard $s has ${rows.length} of $n rows")
      // positions are exactly 1..count within the shard (no gaps, no dups)
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // deterministic: a rerun assigns every row identically
    val again = Curation.shuffleShard(docs, "doc_id", 8)
      .select($"doc_id".as[Long], $"shard".as[Long], $"shard_pos".as[Long])
      .collect()
    assert(again.sortBy(_._1).toSeq == out.sortBy(_._1).toSeq)
    // single-shard degenerate case: a full 1..n global shuffle order
    val one = Curation.shuffleShard(docs, "doc_id", 1)
      .select($"shard_pos".as[Long]).collect().sorted.toSeq
    assert(one == (1L to n).toSeq)
  }

  test("writeShards: one file per shard, rows in shard_pos order on disk") {
    val dir = s"/tmp/graft_shards_${System.nanoTime()}"
    Curation.writeShards(docs, "doc_id", 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    // one file per shard directory — no small-file splinter
    val files = back.inputFiles
    assert(files.length == 4, s"expected 4 shard files, got ${files.length}")
    // within each file, rows are physically in shard_pos order (a trainer
    // reads the shuffle order with no sort): check via the file-level
    // row order of a single shard's parquet
    val shard0 = files.find(_.contains("shard=0")).get
    val rows = spark.read.parquet(shard0).select("shard_pos")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == rows.sorted, "shard file not in shard_pos order")
    assert(rows == (1L to rows.length).toSeq, "positions not contiguous from 1")
  }

  test("interleaveShards mixes sources at their weight ratio in every prefix") {
    // fixture: src0..src19 at 25 docs each; schedule src0 at 3x src1
    val out = Curation.interleaveShards(docs, "doc_id", "source",
        Map("src0" -> 3.0, "src1" -> 1.0), 2)
      .select($"doc_id".as[Long], $"source".as[String], $"shard".as[Long],
        $"interleave_pos".as[Long])
      .collect()
    // only the weighted sources appear
    assert(out.map(_._2).toSet == Set("src0", "src1"))
    assert(out.length == 50, "25 src0 + 25 src1 rows must all be scheduled")
    out.groupBy(_._3).foreach { case (shard, rows) =>
      // positions are contiguous 1..n within the shard
      assert(rows.map(_._4).sorted.toSeq == (1L to rows.length).toSeq)
      // exact stride pattern while both sources are live: every 4-prefix
      // carries 3 src0 + 1 src1 (strides k/3 vs k interleave 3:1)
      val prefix = rows.sortBy(_._4).take(8)
      val n0 = prefix.count(_._2 == "src0")
      assert(n0 >= 5 && n0 <= 7, s"shard $shard 8-prefix has $n0 src0 — want ~6 at 3:1")
    }
    // deterministic under re-evaluation
    val again = Curation.interleaveShards(docs, "doc_id", "source",
        Map("src0" -> 3.0, "src1" -> 1.0), 2)
      .select($"doc_id".as[Long], $"interleave_pos".as[Long]).collect().toSet
    assert(again == out.map(r => (r._1, r._4)).toSet)
  }

  test("weightedHashSample clamps out-of-range weights to drop-all/keep-all") {
    val n = docs.count()
    // weight > 1 degenerates to keep-all, negative to drop-all — not UB
    assert(Curation.weightedHashSample(docs, "doc_id", lit(5.0)).count() == n)
    assert(Curation.weightedHashSample(docs, "doc_id", lit(-3.0)).count() == 0)
    // NULL weight drops the row by contract
    assert(Curation.weightedHashSample(docs, "doc_id", lit(null).cast("double")).count() == 0)
  }

  test("leakage-safe split: duplicate texts always share a split") {
    import spark.implicits._
    val d = Seq(
      (1L, "same text"), (2L, "same text"), (3L, "same text"),
      (4L, "other"), (5L, "third thing")).toDF("doc_id", "text")
    val got = Curation.splitByDupGroup(d, "text", "doc_id",
        Seq(("train", 0.8), ("valid", 0.1), ("test", 0.1)))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(Set(got(1L), got(2L), got(3L)).size == 1,
      s"duplicates split apart: $got")
    // the group variant follows an arbitrary cluster column the same way
    val clustered = d.withColumn("cluster", when($"doc_id" <= 3, 100L).otherwise($"doc_id"))
    val byGroup = Curation.assignSplitByGroup(clustered, "cluster",
        Seq(("train", 0.5), ("test", 0.5)))
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(Set(byGroup(1L), byGroup(2L), byGroup(3L)).size == 1)
  }

  test("token-budget sampling: per-shard overshoot bounded by one document") {
    import spark.implicits._
    val d = (1 to 200).map(i => (i.toLong, (1 to (i % 20 + 5)).map(j => s"t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val perShard = 100L // budget 400 over 4 shards
    val out = Curation.sampleToTokenBudget(d, "text", "doc_id", 400L, shards = 4)
    val kept = out.select($"doc_id", $"token_budget_shard").as[(Long, Long)].collect()
    assert(kept.nonEmpty && kept.length < 200, s"kept ${kept.length} of 200")
    // recompute per-shard token totals of the kept docs
    val tokens = d.select($"doc_id",
        size(split(trim(lower($"text")), "\\s+")).cast("long")).as[(Long, Long)]
      .collect().toMap
    val maxDoc = tokens.values.max
    for ((shard, docs) <- kept.groupBy(_._2)) {
      val total = docs.map(t => tokens(t._1)).sum
      assert(total < perShard + maxDoc,
        s"shard $shard overshot: $total vs $perShard (+ max $maxDoc)")
      // the budget was actually used: stopping earlier would undershoot
      assert(total >= perShard || docs.length == kept.count(_._2 == shard),
        s"shard $shard stopped early at $total")
    }
    // determinism
    val again = Curation.sampleToTokenBudget(d, "text", "doc_id", 400L, shards = 4)
      .select($"doc_id").as[Long].collect().toSet
    assert(again == kept.map(_._1).toSet)
    // budget >= corpus keeps everything
    assert(Curation.sampleToTokenBudget(d, "text", "doc_id", 1000000L, shards = 4)
      .count() == 200L)
  }

  test("CDC chunks: boundaries do not shift downstream of an edit") {
    import spark.implicits._
    val base = (1 to 400).map(i => s"tok${i % 97}w${i}").mkString(" ")
    val edited = "inserted preamble goes here " + base
    val d = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    val chunks = Curation.cdcChunkDocs(d, "text", "doc_id", 16)
      .select($"doc_id", $"chunk_index", $"chunk_md5")
      .as[(Long, Long, String)].collect()
    val c1 = chunks.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    val c2 = chunks.filter(_._1 == 2L).sortBy(_._2).map(_._3)
    assert(c1.length > 5, s"fixture produced only ${c1.length} chunks")
    // every chunk after the first boundary downstream of the edit is
    // byte-identical: the edited doc's tail chunks == the base's tail
    val shared = c1.toSet & c2.toSet
    assert(shared.size >= c1.length - 2,
      s"CDC stability broken: only ${shared.size} of ${c1.length} chunks survived an edit")
    // fixed windows would share (almost) nothing under a 4-token shift
    val fixedShared = {
      val f = Dedup.chunkDedup(d, "text", "doc_id", 16)
        .select($"doc_id", $"chunk_md5").as[(Long, String)].collect()
      f.filter(_._1 == 1L).map(_._2).toSet & f.filter(_._1 == 2L).map(_._2).toSet
    }
    assert(fixedShared.size < shared.size,
      s"fixed windows shared $fixedShared vs CDC ${shared.size} — invariance claim hollow")
    // empty text: zero chunks, no crash
    assert(Curation.cdcChunkDocs(Seq((9L, "")).toDF("doc_id", "text"),
      "text", "doc_id", 16).count() == 0L)
  }
}
