package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification, document fingerprinting.
  *
  * All pure `functions._` expressions — codegen'd, no UDFs, trivially
  * SQL-mirrorable for the DuckDB oracle, and embarrassingly parallel (one
  * narrow projection per document, no shuffles at all).
  */
object TextAnalysis {

  // scope-aware barrier for the multi-consumer frames below: identical to
  // localCheckpoint, but registers with an active MatchScope so a
  // long-running driver can release blocks per call (raw localCheckpoint
  // lives until app exit). Consumers must act within the caller's scope.
  private def mat(df: DataFrame): DataFrame =
    graft.util.Materialize(df, graft.util.CheckpointStrategy.Local)

  /** Whitespace tokens of the trimmed, lowercased text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: alphanumeric runs + punctuation marks
    * each count as one token (a cheap regex proxy for byte-pair tokenizers:
    * words, numbers and each symbol separately). */
  def subwordCountEstimate(text: Column): Column =
    // array_remove instead of filter(_ =!= ""): same result, but a native
    // collection expression rather than an interpreted per-element lambda
    size(array_remove(split(lower(trim(text)), "[^a-z0-9]+"), "")) +
      length(regexp_replace(text, "[a-zA-Z0-9\\s]", ""))

  /** Quality components: character/word statistics used by typical corpus
    * filters (length, mean word length, alpha ratio, punctuation density). */
  def qualityComponents(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_words", size(toks))
      .withColumn("mean_word_len",
        length(regexp_replace(t, "\\s", "")).cast("double") / size(toks))
      .withColumn("alpha_ratio",
        (length(t) - length(regexp_replace(lower(t), "[a-z]", ""))).cast("double") / length(t))
      .withColumn("punct_ratio",
        length(regexp_replace(t, "[^.,;:!?]", "")).cast("double") / length(t))
  }

  /** Composite quality score in [0,1]: word-count band + word-length band +
    * alpha density (a simple, fully arithmetic heuristic — deterministic and
    * oracle-mirrorable). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nWords = size(toks).cast("double")
    val meanLen = length(regexp_replace(text, "\\s", "")).cast("double") / nWords
    val alphaRatio =
      (length(text) - length(regexp_replace(lower(text), "[a-z]", ""))).cast("double") / length(text)
    val wordBand = when(nWords >= 10 && nWords <= 1000, 1.0)
      .when(nWords >= 3, 0.5).otherwise(0.0)
    val lenBand = when(meanLen >= 3 && meanLen <= 10, 1.0).otherwise(0.5)
    (wordBand + lenBand + alphaRatio) / lit(3.0)
  }

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models", table A1 — the published crawl-filter heuristics),
    * one 0/1 flag per rule plus the conjunction:
    *
    *  1. word count in [50, 100000]
    *  2. mean word length in [3, 10]
    *  3. symbol-to-word ratio (# or ellipsis) <= 0.1
    *  4. <= 90% of lines start with a bullet
    *  5. <= 30% of lines end with an ellipsis
    *  6. >= 80% of words contain an alphabetic character
    *  7. >= 2 distinct stop words from {the, be, to, of, and, that, have,
    *     with}
    *
    * Every threshold compares INTEGER counts (`10*sym <= n_words`, not
    * `sym/n_words <= 0.1`) so the flags are bit-exact across engines —
    * no float division to disagree about. One codegen'd projection per
    * document, no shuffle: at 100 TB this runs at scan speed next to the
    * other text filters. */
  def gopherFlags(df: DataFrame, textCol: String, idCol: String,
                  keep: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val words = filter(split(trim(t), "\\s+"), w => length(w) > 0)
    val lines = split(t, "\n")
    val nWords = size(words).cast("long")
    val nLines = size(lines).cast("long")
    val chars = coalesce(
      aggregate(words, lit(0L), (a, w) => a + length(w).cast("long")), lit(0L))
    val sym = (regexp_count(t, lit("#")) + regexp_count(t, lit("\\.\\.\\.")) +
      regexp_count(t, lit("…"))).cast("long")
    val bullet = size(filter(lines, l => trim(l).rlike("^[-•*]"))).cast("long")
    val ellipsis = size(filter(lines, l => rtrim(l).rlike("(\\.\\.\\.|…)$"))).cast("long")
    val alpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val stops = size(array_intersect(
      array_distinct(transform(words, w => lower(w))),
      array(Seq("the", "be", "to", "of", "and", "that", "have", "with").map(lit): _*)))
    def flag(c: Column): Column = when(c, 1L).otherwise(0L)
    val r1 = flag(nWords >= 50L && nWords <= 100000L)
    val r2 = flag(chars >= nWords * 3L && chars <= nWords * 10L)
    val r3 = flag(sym * 10L <= nWords)
    val r4 = flag(bullet * 10L <= nLines * 9L)
    val r5 = flag(ellipsis * 10L <= nLines * 3L)
    val r6 = flag(alpha * 5L >= nWords * 4L)
    val r7 = flag(stops >= 2)
    // `keep` passes caller columns through the projection so composed
    // pipelines (e.g. warc_to_text: langId + normalize + flags) stay ONE
    // row-wise select instead of self-joining two projections by id
    df.select((col(idCol) +: keep.map(col)) ++ Seq(nWords.as("n_words"),
      r1.as("r_word_count"), r2.as("r_mean_word_len"), r3.as("r_symbol_ratio"),
      r4.as("r_bullet_lines"), r5.as("r_ellipsis_lines"), r6.as("r_alpha_words"),
      r7.as("r_stopwords"),
      (r1 * r2 * r3 * r4 * r5 * r6 * r7).as("pass")): _*)
  }

  /** Feature-hashed linear text classifier (the fastText/Vowpal "hashing
    * trick" shape): each token hashes to one of `buckets` feature slots,
    * each slot carries a fixed INTEGER weight in [-1000, 1000] derived
    * from a second hash of the slot id, and the document scores
    * sigmoid(Σ w / (1000 · n)). A production quality classifier swaps the
    * hash-derived weights for trained ones — the plumbing (hash, lookup,
    * accumulate, squash) is identical, and keeping the accumulation in
    * integers makes the whole pipeline bit-exact across engines (float
    * summation order never enters; only the final sigmoid is floating
    * point, absorbed by round-6). One codegen'd projection, no shuffle,
    * no weight table to broadcast — the "table" is arithmetic. */
  def hashedLinearScore(df: DataFrame, textCol: String, idCol: String,
                        buckets: Int = 2048): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val toks = filter(split(lower(trim(col(textCol))), "\\s+"), w => length(w) > 0)
    def md5Long(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long") % 1000000L
    val wsum = coalesce(
      aggregate(toks, lit(0L), (a, w) => {
        val slot = md5Long(w) % buckets.toLong
        a + (md5Long(concat(lit("w:"), slot.cast("string"))) % 2001L - 1000L)
      }), lit(0L))
    val n = size(toks).cast("long")
    val score = when(n === 0L, 0.5).otherwise(
      lit(1.0) / (lit(1.0) + exp(-wsum.cast("double") / (n.cast("double") * 1000.0))))
    df.select(col(idCol), n.as("n_tokens"), wsum.as("w_sum"),
      round(score, 6).as("score"),
      when(wsum > 0L, 1L).otherwise(0L).as("label"))
  }

  // ------------------------------------------------------------ BPE tokenizer

  /** Learn a BPE merge table (Sennrich et al. 2016) from the corpus's
    * word-frequency profile — DRIVER-side on a bounded vocabulary, which
    * is how production tokenizers are actually trained: the learner
    * needs the word-frequency table (tiny after the top-`maxWords`
    * cut), not the corpus. One distributed pass builds that table; the
    * merge loop then runs locally and deterministically (ties break by
    * pair lexicographically), so the learned table is reproducible for
    * any corpus version. Stops early when the best pair occurs fewer
    * than 2 times. Apply is the distributed half —
    * [[graft.fuzzy.vectorFunctions.bpe_tokens]] / [[bpeVocab]]. */
  def bpeLearn(df: DataFrame, textCol: String, numMerges: Int,
               maxWords: Int = 50000): Seq[(String, String)] = {
    require(numMerges > 0 && maxWords > 0, "numMerges and maxWords must be positive")
    val wordFreq = df.select(explode(tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // word -> token list, weighted by corpus frequency
    val words = wordFreq.map { case (w, c) =>
      (scala.collection.mutable.ArrayBuffer.from(
        w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < numMerges) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((toks, c) <- words; i <- 0 until toks.size - 1)
        pairCounts.updateWith((toks(i), toks(i + 1)))(v => Some(v.getOrElse(0L) + c))
      if (pairCounts.isEmpty) continue = false
      else {
        val (best, cnt) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        if (cnt < 2) continue = false
        else {
          merges += best
          val joined = best._1 + best._2
          for ((toks, _) <- words) {
            var i = 0
            while (i < toks.size - 1) {
              if (toks(i) == best._1 && toks(i + 1) == best._2) {
                toks(i) = joined; toks.remove(i + 1)
              } else i += 1
            }
          }
        }
      }
    }
    merges.toSeq
  }

  /** Distributed BPE apply + subword vocabulary: tokenize every word
    * instance against `merges` and count each subword over the corpus.
    * The encode runs ONCE PER DISTINCT WORD (the classic tokenizer
    * cache, expressed relationally: distinct + count, encode the
    * distinct frame, weight the explode by the count) — at 100 TB the
    * expensive kernel touches the vocabulary, not the token stream.
    * `minCount` bounds the output like [[tfIdf]]'s df cut. */
  def bpeVocab(df: DataFrame, textCol: String,
               merges: Seq[(String, String)], minCount: Long = 1L): DataFrame = {
    val words = df.select(explode(tokens(col(textCol))).as("__w"))
      .where(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
    words
      .select(explode(graft.fuzzy.vectorFunctions.bpe_tokens(col("__w"), merges))
        .as("token"), col("__c"))
      .groupBy(col("token")).agg(sum(col("__c")).cast("long").as("n"))
      .where(col("n") >= minCount)
  }

  /** Marker-word tables for the n-gram/stopword language heuristic: small
    * high-frequency function words per language, 14 languages. Shared
    * function words across related languages (es/pt "que", da/no "det")
    * are resolved by the hit COUNTS over the whole document, and exact
    * ties deterministically by table order — so keep the most
    * globally-common corpus languages earliest. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "las", "una", "por", "como", "para"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "pour", "qui", "sur", "pas", "avec"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"),
    "it" -> Seq("il", "di", "che", "non", "per", "con", "del", "sono", "gli", "alla"),
    "pt" -> Seq("não", "uma", "os", "em", "do", "da", "dos", "mais", "são", "como"),
    "nl" -> Seq("het", "een", "van", "niet", "dat", "aan", "voor", "maar", "zijn", "ook"),
    "sv" -> Seq("och", "att", "det", "som", "på", "är", "av", "för", "inte", "med"),
    "da" -> Seq("og", "det", "at", "til", "er", "som", "på", "ikke", "jeg", "med"),
    "no" -> Seq("og", "det", "er", "som", "på", "til", "ikke", "jeg", "han", "av"),
    "pl" -> Seq("nie", "się", "jest", "czy", "ale", "jak", "tak", "przez", "jego", "tylko"),
    "tr" -> Seq("bir", "ve", "bu", "için", "ile", "gibi", "daha", "çok", "ama", "kadar"),
    "id" -> Seq("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "akan"),
    "ru" -> Seq("и", "в", "не", "на", "что", "это", "как", "его", "но", "по"),
  )

  /** Language-ID heuristic: count marker-word hits per language over the
    * whitespace tokens; predict the argmax, "und" (undetermined) when no
    * marker hits at all. Ties break by table order. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val hits = langMarkers.map { case (lang, markers) =>
      lang -> graft.fuzzy.vectorFunctions.marker_hits(toks, markers.toArray)
    }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    hits.foldRight(lit("und"): Column) { case ((lang, h), acc) =>
      when(best > 0 && h === best, lit(lang)).otherwise(acc)
    }
  }
  // NOTE: foldRight so that the FIRST language in table order wins ties —
  // deterministic argmax.

  /** The DuckDB mirror of [[langId]], generated from [[langMarkers]] so the
    * oracle can never drift from the implementation. */
  /** Confidence margin of [[langId]]: best marker-hit count minus the
    * runner-up's (0 when the top is tied or nothing matched) — the
    * filter knob for "classified, but barely" documents. Exact integer
    * arithmetic over the same marker table as langId. */
  def langIdMargin(text: Column): Column = {
    val toks = tokens(text)
    val hs = langMarkers.map { case (_, ms) =>
      graft.fuzzy.vectorFunctions.marker_hits(toks, ms.toArray)
    }
    val best = hs.reduce(greatest(_, _))
    val nBest = hs.map(h => when(h === best, 1).otherwise(0)).reduce(_ + _)
    val runnerUp = hs.map(h => when(h < best, h).otherwise(lit(0))).reduce(greatest(_, _))
    when(nBest > 1, lit(0)).otherwise(best - runnerUp).cast("long")
  }

  /** DuckDB SQL for (doc_id, lang_pred, margin) GENERATED from the same
    * marker table as the implementation (like [[langIdOracleSql]], the
    * two cannot drift). */
  def langIdMarginOracleSql: String = {
    val langs = langMarkers.map(_._1)
    val hitCols = langMarkers.map { case (lang, ms) =>
      val lst = ms.map(m => s"'$m'").mkString(",")
      s"len(list_filter(w, x -> list_contains([$lst], x))) AS h_$lang"
    }.mkString(",\n           ")
    val best = langs.map("h_" + _).mkString("greatest(", ", ", ")")
    val cases = langs.init.map(l => s"WHEN h_$l = best THEN '$l'").mkString("\n           ")
    val nBest = langs.map(l => s"(h_$l = best)::INT").mkString(" + ")
    val runnerUp = langs.map(l => s"CASE WHEN h_$l < best THEN h_$l ELSE 0 END")
      .mkString("greatest(", ", ", ")")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w FROM documents),
         h AS (SELECT doc_id,
           $hitCols
         FROM t),
         b AS (SELECT *, $best AS best FROM h)
         SELECT doc_id, CASE
           WHEN best = 0 THEN 'und'
           $cases
           ELSE '${langs.last}' END AS lang_pred,
           CAST(CASE WHEN ($nBest) > 1 THEN 0 ELSE best - $runnerUp END AS BIGINT) AS margin
         FROM b"""
  }

  def langIdOracleSql: String = langIdOracleSqlOver("documents", "text")

  /** [[langIdOracleSql]] retargeted at any relation/text column — the
    * composed-pipeline oracles (e.g. `warc_to_text`) run the same
    * generated marker SQL over a derived CTE instead of `documents`,
    * so the mirror still cannot drift from [[langMarkers]]. */
  def langIdOracleSqlOver(relation: String, textCol: String): String = {
    val langs = langMarkers.map(_._1)
    val hitCols = langMarkers.map { case (lang, ms) =>
      val lst = ms.map(m => s"'$m'").mkString(",")
      s"len(list_filter(w, x -> list_contains([$lst], x))) AS h_$lang"
    }.mkString(",\n           ")
    val best = langs.map("h_" + _).mkString("greatest(", ", ", ")")
    val cases = langs.init.map(l => s"WHEN h_$l = $best THEN '$l'").mkString("\n           ")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(lower($textCol)), '\\s+') AS w FROM $relation),
         h AS (SELECT doc_id,
           $hitCols
         FROM t)
         SELECT doc_id, CASE
           WHEN $best = 0 THEN 'und'
           $cases
           ELSE '${langs.last}' END AS lang_pred
         FROM h"""
  }

  /** C4-style blocklist filter (the published "bad words" crawl gate,
    * generalized to multi-word phrases): flag documents containing any
    * phrase from `phrases`, with exact occurrence accounting. Phrases
    * normalize to lowercased single-spaced word sequences; a document
    * matches when any of its word n-grams (n = 1..longest phrase)
    * equals a phrase — so "free money now" matches as a contiguous
    * 3-gram, never across reorderings.
    *
    * Emits (id, n_blocked_hits — gram OCCURRENCES in the list,
    * n_blocked_phrases — DISTINCT phrases present, blocked 0/1). One
    * projection, no explode, no shuffle: the n-gram arrays build inside
    * codegen and membership runs through the broadcast-HashSet
    * `marker_hits` kernel (the langid shape) — a thousands-entry
    * blocklist rides the closure like the marker tables do. */
  def blocklistFlags(df: DataFrame, textCol: String, idCol: String,
                     phrases: Seq[String]): DataFrame = {
    val norm = normalizePhrases(phrases)
    val lens = phraseLengths(norm)
    // token array and gram array materialize as columns stage by stage:
    // a slice lambda over the raw split expression would re-tokenize per
    // gram POSITION (the dsirSelect O(tokens²) trap), and a raw `grams`
    // expression would build the gram array twice (once per marker_hits)
    val toks = col("__toks")
    val grams = lens.map { n =>
      when(size(toks) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    }.reduce(concat(_, _))
    df.select(col(idCol),
        filter(tokens(col(textCol)), t => length(t) > 0).as("__toks"))
      .select(col(idCol), grams.as("__grams"))
      .select(col(idCol),
        graft.fuzzy.vectorFunctions.marker_hits(col("__grams"), norm.toArray)
          .cast("long").as("n_blocked_hits"),
        graft.fuzzy.vectorFunctions.marker_hits(array_distinct(col("__grams")), norm.toArray)
          .cast("long").as("n_blocked_phrases"))
      .withColumn("blocked", (col("n_blocked_hits") > 0).cast("int"))
  }

  /** ONE normalization pipeline for blocklist phrases, shared by
    * implementation and generated oracle (the drift seam a duplicated
    * copy would open). */
  private def normalizePhrases(phrases: Seq[String]): Seq[String] = {
    require(phrases.nonEmpty, "blocklist needs at least one phrase")
    val norm = phrases.map(_.trim.toLowerCase.split("\\s+").mkString(" "))
      .filter(_.nonEmpty).distinct.sorted
    require(norm.nonEmpty, "blocklist phrases were all empty after trim")
    norm
  }

  /** The DISTINCT phrase word-lengths — grams are built only for these
    * (a {1, 4}-length list never constructs 2- or 3-gram arrays). */
  private def phraseLengths(norm: Seq[String]): Seq[Int] =
    norm.map(_.count(_ == ' ') + 1).distinct.sorted

  /** DuckDB replay of [[blocklistFlags]], GENERATED from the same phrase
    * list (single source — implementation and oracle cannot drift). */
  def blocklistOracleSql(table: String, textCol: String, idCol: String,
                         phrases: Seq[String]): String = {
    val norm = normalizePhrases(phrases)
    // SQL string-literal escaping: real blocklists contain apostrophes
    val lst = norm.map(p => s"'${p.replace("'", "''")}'")
      .mkString("[", ", ", "]")
    val gramParts = phraseLengths(norm).map { n =>
      s"""CASE WHEN len(toks) < $n THEN []
         |      ELSE list_transform(range(0, len(toks) - ${n - 1}),
         |             i -> array_to_string(list_slice(toks, i + 1, i + $n), ' ')) END"""
        .stripMargin
    }.mkString(" || ")
    s"""WITH t AS (SELECT $idCol AS id,
       |  list_filter(string_split_regex(trim(lower($textCol)), '\\s+'),
       |              x -> length(x) > 0) AS toks FROM $table),
       |g AS (SELECT id, $gramParts AS grams FROM t)
       |SELECT id AS $idCol,
       |  CAST(len(list_filter(grams, x -> list_contains($lst, x))) AS BIGINT) AS n_blocked_hits,
       |  CAST(len(list_filter(list_distinct(grams), x -> list_contains($lst, x))) AS BIGINT) AS n_blocked_phrases,
       |  CAST(len(list_filter(grams, x -> list_contains($lst, x))) > 0 AS INT) AS blocked
       |FROM g""".stripMargin
  }

  /** Repetition statistics (the Gopher-style repetition filters): fraction
    * of duplicate lines and of duplicate tokens within a document. High
    * values flag boilerplate/templated/looping text for removal. Pure
    * array arithmetic — one narrow projection, no shuffle, no lambdas. */
  def dupLineFraction(text: Column): Column = {
    val lines = split(text, "\n")
    (size(lines) - size(array_distinct(lines))).cast("double") / size(lines)
  }

  def dupTokenFraction(text: Column): Column = {
    val toks = tokens(text)
    (size(toks) - size(array_distinct(toks))).cast("double") / size(toks)
  }

  /** TF-IDF weights per (document, token) — the classic sparse text
    * representation for retrieval/clustering stages of a data pipeline.
    * `tf` is the in-document token count, `df` the number of documents
    * containing the token (kept when >= `minDf`), and
    * `tfidf = tf * (ln((N+1)/(df+1)) + 1)` (smoothed), rounded to 6
    * decimals for cross-engine comparability.
    *
    * Shape: two hash aggregates (both with map-side partial aggregation)
    * and one equi-join on the token — the document-frequency side is
    * vocabulary-sized, so AQE broadcasts it in practice. `totalDocs`
    * avoids a count job when the caller already knows N (same contract as
    * `AnnSearch.topK`'s `queryCount`). */
  def tfIdf(df: DataFrame, textCol: String, idCol: String, minDf: Long = 1L,
            totalDocs: Option[Long] = None): DataFrame = {
    val n = totalDocs.getOrElse(df.count())
    // localCheckpoint: `tf` feeds the doc-frequency table AND the final
    // join — the multi-consumer re-execution trap (SCALE.md round-10)
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .transform(mat)
    val docFreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
    tf.join(docFreq, "token")
      .withColumn("tfidf",
        round(col("tf") * (log(lit(n + 1.0) / (col("df") + 1.0)) + 1.0), 6))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** Okapi BM25 top-k sparse retrieval: for each `queries` row, the `k`
    * best `corpus` documents by the classic BM25 score
    * `Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))` with the
    * Robertson idf `ln(1 + (N − df + ½)/(df + ½))` (always positive) —
    * the lexical-retrieval baseline next to the dense [[AnnSearch]] paths,
    * and the standard first stage of retrieval-augmented pipelines.
    *
    * Cross-engine determinism follows the LM family's quantized-exact-sum
    * recipe: each per-term contribution lands on the integer micro grid
    * (`round(x·1e6)` as long) BEFORE the per-document sum, so the score is
    * an order-independent integer sum, and ranking runs through the same
    * [[graft.fuzzy.BoundedTopK]] heap as every ANN path (map-side partial
    * aggregation; shuffle capped at queries × partitions × k) with ties
    * broken (score desc, doc id asc). `dl/avgdl` is computed per row as
    * `(dl · N) / Σdl` from exact integers — no pre-divided float constant.
    *
    * Plan shape: one postings build (token explode + hash-agg, checkpointed
    * — it feeds document length, document frequency AND the scoring join),
    * two corpus-sized hash-aggs, then an equi-join of the query terms
    * against the postings on the token key. Query sets are usually tiny →
    * AQE broadcasts them and the postings never shuffle on the token key.
    * Skew guard for web-scale corpora: `maxDf` drops terms whose postings
    * list exceeds the cap from SCORING (a stopword in a query would drag a
    * corpus-sized postings list through the join; dropping df ≈ N terms
    * loses almost no ranking signal since their idf ≈ 0). Default keeps
    * every term — the oracled configuration. */
  def bm25TopK(corpus: DataFrame, textCol: String, idCol: String,
               queries: DataFrame, queryTextCol: String, queryIdCol: String,
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
               maxDf: Long = Long.MaxValue): DataFrame = {
    // One-shot plan: the query terms join tf FIRST, so document length
    // and document frequency attach only to the (tiny) matched subset —
    // joining a denormalized whole-corpus postings frame instead measured
    // +25% at sf10 for a 250-query batch. The index path amortizes that
    // denormalization across many searches; this path never should.
    require(k > 0, s"k must be positive (got $k)")
    val (tf, dl, docFreq, nDocs, totTok) =
      bm25Corpus(corpus, textCol, idCol, maxDf)
    val scored = bm25QueryTerms(queries, queryTextCol, queryIdCol)
      .join(tf, Seq("token"))
      .join(dl, Seq(idCol))
      .join(docFreq, Seq("token"))
    bm25Rank(scored, idCol, nDocs, totTok, k1, b, k)
  }

  /** The materialized BM25 index: one denormalized postings frame
    * (idCol, token, tf, dl, df) plus the two corpus scalars the score
    * needs. Build once per corpus version with [[bm25Index]], search any
    * number of query batches with [[bm25TopKWithIndex]] (one token
    * equi-join + heap ranking per batch — no corpus re-aggregation), or
    * persist/reload via [[saveBm25Index]]/[[loadBm25Index]] — the same
    * fit-once/search-many lifecycle as the IVF postings. */
  final case class Bm25Index(postings: DataFrame, idCol: String,
                             nDocs: Long, totalTokens: Long,
                             k1: Double, b: Double)

  /** Build the [[Bm25Index]] for a corpus: postings = token counts per
    * (doc, token) joined with document length and document frequency.
    * The tf frame feeds three aggregations and is always checkpointed
    * (the multi-consumer re-execution trap); the joined postings frame
    * is checkpointed only when `materialize` is set — right when the
    * index serves MANY searches (streams, repeated batches, save/load),
    * wasted when it serves one (a corpus-sized materialization for a
    * single consumer — measured as the difference between the one-shot
    * `bm25TopK` and an eagerly built index at sf10). `maxDf` drops
    * stopword-sized postings lists at BUILD time, so no query can drag
    * them through the join. */
  def bm25Index(corpus: DataFrame, textCol: String, idCol: String,
                k1: Double = 1.2, b: Double = 0.75,
                maxDf: Long = Long.MaxValue,
                materialize: Boolean = true): Bm25Index = {
    // RAW localCheckpoint barriers throughout the index build, NOT the
    // scope-aware mat: a stored index outlives any MatchScope (a stream
    // searches it across micro-batches long after the building scope
    // closed), and that must hold for the intermediate tf/dl too when
    // materialize = false leaves the postings lazy over them —
    // app-lifetime blocks are the contract, like the stream writers'
    // prepared statics
    val (tf, dl, docFreq, nDocs, totTok) =
      bm25Corpus(corpus, textCol, idCol, maxDf, barrier = _.localCheckpoint())
    val joined = tf.join(dl, Seq(idCol)).join(docFreq, Seq("token"))
    val postings = if (materialize) joined.localCheckpoint() else joined
    Bm25Index(postings, idCol, nDocs, totTok, k1, b)
  }

  /** Shared corpus half of the BM25 family: the checkpointed tf frame
    * (it feeds three aggregations — the multi-consumer trap), document
    * length, `maxDf`-gated document frequency, and the two exact corpus
    * scalars. `barrier` picks the checkpoint lifetime: the one-shot
    * search uses the scope-aware [[mat]]; the INDEX build passes a raw
    * `localCheckpoint` so the returned postings' lineage survives the
    * building scope even with `materialize = false` (a lazy index over
    * scope-released tf/dl barriers would die at scope close). */
  private[pipeline] def bm25Corpus(corpus: DataFrame, textCol: String, idCol: String,
                                   maxDf: Long,
                                   barrier: DataFrame => DataFrame = mat)
      : (DataFrame, DataFrame, DataFrame, Long, Long) = {
    val tf = corpus
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .transform(barrier)
    // dl has two consumers (the scalar stats and the scoring join) and
    // sits on top of a corpus-sized aggregation — checkpoint, or the
    // tf pass runs twice
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl")).transform(barrier)
    val statsRow = dl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    val nDocs = statsRow.getLong(0)
    // empty corpus: no scored rows exist, the constant only has to be finite
    val totTok = math.max(statsRow.getLong(1), 1L)
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDf)
    (tf, dl, docFreq, nDocs, totTok)
  }

  /** Exact DECREMENTAL index maintenance under a forget list — the one
    * aggregate artifact where the right-to-be-forgotten cascade
    * ([[graft.pipeline.Curation.forget]]) does NOT force a corpus
    * rebuild: every statistic a deleted document contributed to the
    * index is recoverable from its own deleted rows. Per-token df
    * decrements by the count of that token's deleted rows ((token, id)
    * is unique, so row count IS doc count); nDocs/totalTokens decrement
    * by the deleted documents' count and dl sum.
    *
    * What this buys — and costs: the corpus TEXT is never touched, so a
    * compliance forget works on the stored index alone (the original
    * documents may themselves already be deleted). The correction
    * compute is O(deleted postings), but `materialize = true` (the
    * stored-index default) re-checkpoints the KEPT rows — O(kept) — and
    * at sf10 that materialization (29.9 s over 10.7M postings) exceeded
    * a fresh kept-corpus build (~21 s): when the corpus text is still
    * on hand and tokenization is not the bottleneck, rebuild instead;
    * when it is gone, or the index is much smaller than the text, this
    * is the only — and an exact — option. `materialize = false` returns
    * the lazily corrected index for a one-shot search.
    *
    * Exactness caveat: equals a fresh [[bm25Index]] build on the kept
    * corpus ONLY for an ungated build (the default; spec-asserted,
    * scores and all). A `maxDf` gate at build time breaks the
    * equivalence in two ways: (1) a forgotten document whose every
    * token was gated has no postings rows to announce its dl/N
    * contribution, leaving nDocs/totalTokens residually high; (2)
    * gated-token RESURRECTION — a token whose df sat just above the
    * gate can fall back under it once forgetters leave, so a rebuild
    * re-admits its postings while the decrement has no rows to restore.
    * Gated indexes must rebuild on forget (TUNING.md). Also note df is
    * corrected only for surviving rows; a token whose every posting was
    * forgotten simply has no rows left, which is the correct end
    * state. */
  def bm25Forget(ix: Bm25Index, forgetIds: DataFrame,
                 materialize: Boolean = true): Bm25Index = {
    val fids = broadcast(forgetIds.select(col(ix.idCol)).distinct())
    // deleted must survive past this call when the kept frame stays lazy
    // (it feeds the correction join) — raw checkpoint, the stored-index
    // lifetime contract; it is a small frame (the forget list's rows)
    val deleted = ix.postings.join(fids, Seq(ix.idCol), "left_semi")
      .localCheckpoint()
    val delPerToken = deleted.groupBy(col("token"))
      .agg(count(lit(1)).as("__ddf"))
    val keptLazy = ix.postings.join(fids, Seq(ix.idCol), "left_anti")
      .join(delPerToken, Seq("token"), "left")
      .withColumn("df", col("df") - coalesce(col("__ddf"), lit(0L)))
      .drop("__ddf")
    // raw checkpoint: same app-lifetime stored-index contract as
    // bm25Index's build barriers. This is the O(kept) cost — skip it
    // (materialize = false) for a one-shot search over the correction.
    val kept = if (materialize) keptLazy.localCheckpoint() else keptLazy
    val remRow = deleted.select(col(ix.idCol), col("dl")).distinct()
      .agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
    Bm25Index(kept, ix.idCol, ix.nDocs - remRow.getLong(0),
      math.max(ix.totalTokens - remRow.getLong(1), 1L), ix.k1, ix.b)
  }

  /** Incremental index maintenance — the append twin of [[bm25Forget]]
    * (the nightly-ingest shape, like [[AnnSearch.ivfAppendPostings]] for
    * the vector index): fold a new-document batch into a stored index
    * without re-tokenizing the old corpus. The batch half costs
    * O(batch postings); the df-correction rewrite costs O(postings of
    * tokens the batch touches) — old rows of untouched tokens pass
    * through unchanged. Exactly equals [[bm25Index]] over the unioned
    * corpus for the default UNGATED build (spec-pinned + oracled). A
    * maxDf-gated index cannot append decrementally for the same reason
    * it cannot forget: the batch can push a token over the gate whose
    * old postings should then drop, and the gate decision cannot be
    * replayed from the index alone — gated indexes rebuild (TUNING.md).
    * Batch ids must be disjoint from the indexed ids (id collision
    * double-counts df — same contract as ivfAppendPostings).
    *
    * Cost caveat (same trap [[bm25Forget]] documents): the COMPUTE is
    * O(batch + touched-token postings), but the default
    * `materialize = true` re-checkpoints the ENTIRE corrected frame —
    * O(index) per append (measured at sf10: 5.0 s fold vs 6.7 s full
    * rebuild on a corpus where the batch touches every token —
    * SCALE.md). Pass `materialize = false` for a one-shot search over
    * the appended view; keep the default when the index serves many
    * searches or further folds (the streaming writer's per-trigger
    * lineage cut depends on it). */
  def bm25Append(ix: Bm25Index, batch: DataFrame, textCol: String,
                 materialize: Boolean = true): Bm25Index = {
    // raw checkpoints: stored-index lifetime, same as the build barriers
    val (tf, dl, newDf, nNew, totNew) =
      bm25Corpus(batch, textCol, ix.idCol, Long.MaxValue, _.localCheckpoint())
    // per-token df delta — bounded by the batch vocabulary, broadcast
    val addPerToken = broadcast(newDf.select(col("token"), col("df").as("__adf")))
    val oldCorrected = ix.postings.join(addPerToken, Seq("token"), "left")
      .withColumn("df", col("df") + coalesce(col("__adf"), lit(0L)))
      .drop("__adf")
    // new rows carry batch df + old df for tokens the index already has;
    // restrict to BATCH-TOUCHED tokens before the distinct (broadcast
    // semi-join) so the dedup shuffles touched-token postings, never the
    // whole index — the claimed O(touched) cost, not O(index)
    val oldPerToken = ix.postings
      .join(broadcast(newDf.select(col("token"))), Seq("token"), "left_semi")
      .select(col("token"), col("df").as("__odf"))
      .distinct()
    val newRows = tf.join(dl, Seq(ix.idCol))
      .join(newDf, Seq("token"))
      .join(oldPerToken, Seq("token"), "left")
      .withColumn("df", col("df") + coalesce(col("__odf"), lit(0L)))
      .drop("__odf")
    val joined = oldCorrected.unionByName(newRows)
    val postings = if (materialize) joined.localCheckpoint() else joined
    // bm25Corpus clamps an empty corpus's totTok to 1 (a finiteness
    // guard for the BUILD path); as an append DELTA that phantom token
    // would shift every lenNorm — a token-less batch adds zero, and an
    // EMPTY BASE index carries the same clamp in ix.totalTokens, so a
    // from-scratch bootstrap re-derives the scalar from the batch alone
    // (matching what a rebuild over the union would compute)
    val totAdd = if (nNew == 0) 0L else totNew
    val newTotal = if (ix.nDocs == 0) math.max(totAdd, 1L)
                   else ix.totalTokens + totAdd
    Bm25Index(postings, ix.idCol, ix.nDocs + nNew, newTotal, ix.k1, ix.b)
  }

  /** Query terms: one row per (query id, distinct non-empty token). */
  private def bm25QueryTerms(queries: DataFrame, queryTextCol: String,
                             queryIdCol: String): DataFrame =
    queries.select(col(queryIdCol).as("query_id"),
        explode(array_distinct(tokens(col(queryTextCol)))).as("token"))
      .where(length(col("token")) > 0)

  /** Shared scoring + ranking half: quantized per-term contribution,
    * integer per-document sum, BoundedTopK ranking. `scored` must carry
    * (query_id, idCol, tf, dl, df). */
  private def bm25Rank(scored: DataFrame, idCol: String, nDocs: Long,
                       totTok: Long, k1: Double, b: Double, k: Int): DataFrame = {
    val idf = log((lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val lenNorm = lit(1.0) - lit(b) +
      lit(b) * (col("dl").cast("double") * lit(nDocs.toDouble) / lit(totTok.toDouble))
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) / (col("tf") + lit(k1) * lenNorm)
    scored
      .select(col("query_id"), col(idCol),
        round(contrib * lit(1e6)).cast("long").as("__c"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("__c")).as("__sum_q"))
      .groupBy(col("query_id"))
      .agg(graft.fuzzy.vectorFunctions.topk_pairs(
        col("__sum_q").cast("double"), col(idCol), k).as("__tk"))
      .select(col("query_id"), posexplode(col("__tk")))
      .select(col("query_id"), col("col.id").as(idCol),
        (col("col.score") / 1e6).as("score"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Rank `k` documents per query against a prebuilt [[Bm25Index]]: the
    * query terms equi-join the postings on the token key (tiny query
    * sets broadcast under AQE — the postings never shuffle), each
    * per-term contribution lands on the 1e-6 integer grid before the
    * per-document sum, and ranking runs through the BoundedTopK heap.
    * Identical arithmetic to [[bm25TopK]] — this IS its search half. */
  def bm25TopKWithIndex(ix: Bm25Index, queries: DataFrame,
                        queryTextCol: String, queryIdCol: String,
                        k: Int = 10): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val scored = bm25QueryTerms(queries, queryTextCol, queryIdCol)
      .join(ix.postings, Seq("token"))
    bm25Rank(scored, ix.idCol, ix.nDocs, ix.totalTokens, ix.k1, ix.b, k)
  }

  /** Persist a [[Bm25Index]] TOKEN-BUCKETED: postings land under
    * `path`/postings/bucket=N/ with `bucket = pmod(xxhash64(token),
    * nBuckets)` — the [[AnnSearch.savePostings]] recipe (cell-partitioned
    * IVF postings) applied to the lexical index. A search batch touches
    * only its query terms' buckets, so partition pruning does the index
    * lookup at the storage layer instead of scanning every postings row
    * (the measured ~2.5 s per-batch floor of the flat store at the 500k-doc
    * tier — SCALE.md). The scalars (id column, corpus stats, k1/b, and
    * the bucket count the search side must reuse) go to `path`/meta.
    *
    * Bucket-count sizing: pruning removes (nBuckets − touched)/nBuckets
    * of the scan, so more buckets prune harder — until per-bucket files
    * drop under a parquet row group. 64 buckets ≈ 1.6% of the corpus per
    * query term at the default; a 100 TB postings store wants 1-4k. */
  def saveBm25Index(ix: Bm25Index, path: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1 (got $nBuckets)")
    ix.postings
      .withColumn("bucket", pmod(xxhash64(col("token")), lit(nBuckets.toLong)))
      // one shuffle task per bucket -> ONE file per bucket directory:
      // without it every write task spills a sliver into every bucket
      // (up to tasks x nBuckets small files — measured 5x slower to
      // write and a per-read listing tax at nBuckets = 1024)
      .repartition(nBuckets, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
    val spark = ix.postings.sparkSession
    import spark.implicits._
    Seq((ix.idCol, ix.nDocs, ix.totalTokens, ix.k1, ix.b, nBuckets))
      .toDF("id_col", "n_docs", "total_tokens", "k1", "b", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a persisted [[Bm25Index]] as a full in-memory-plan index: the
    * postings read spans every bucket (the `bucket` partition column is
    * dropped to restore the postings contract) — the right form for
    * [[bm25Forget]] or any whole-index maintenance pass. For SEARCH,
    * prefer [[bm25TopKStored]] via [[loadBm25StoredIndex]], which prunes
    * the scan to the query terms' buckets. */
  def loadBm25Index(spark: org.apache.spark.sql.SparkSession, path: String): Bm25Index = {
    val m = spark.read.parquet(s"$path/meta").head()
    Bm25Index(spark.read.parquet(s"$path/postings").drop("bucket"),
      m.getAs[String]("id_col"), m.getAs[Long]("n_docs"),
      m.getAs[Long]("total_tokens"), m.getAs[Double]("k1"), m.getAs[Double]("b"))
  }

  /** Handle to a token-bucketed on-disk index: the meta scalars plus ONE
    * bucket-columned postings frame opened at load — its cached file
    * listing (InMemoryFileIndex) is what every search batch prunes
    * against, so per-batch cost is the touched buckets' data, not a
    * re-listing of nBuckets directories (measured: a per-batch
    * `spark.read` re-list cost ~2 s at nBuckets = 1024 and erased the
    * pruning win). */
  final case class Bm25StoredIndex(postings: DataFrame, path: String,
                                   idCol: String, nDocs: Long,
                                   totalTokens: Long, k1: Double, b: Double,
                                   nBuckets: Int)

  def loadBm25StoredIndex(spark: org.apache.spark.sql.SparkSession,
                          path: String): Bm25StoredIndex = {
    val m = spark.read.parquet(s"$path/meta").head()
    Bm25StoredIndex(spark.read.parquet(s"$path/postings"), path,
      m.getAs[String]("id_col"), m.getAs[Long]("n_docs"),
      m.getAs[Long]("total_tokens"), m.getAs[Double]("k1"),
      m.getAs[Double]("b"), m.getAs[Int]("n_buckets"))
  }

  /** Search a token-bucketed stored index with a PRUNED postings scan:
    * the batch's distinct token buckets (a bounded driver collect — at
    * most min(#distinct query terms, nBuckets) values, both small by
    * construction) become a static `bucket IN (...)` partition filter on
    * the loaded postings frame, so only the touched `bucket=N/`
    * directories are scanned (PartitionFilters on the scan —
    * spec-asserted like the IVF postings). Arithmetic is identical to
    * [[bm25TopKWithIndex]]; only the scan shrinks. Pruning is a no-op
    * when the batch's term set covers every bucket (a 1000-query batch
    * at any realistic nBuckets) — the latency win is the SMALL-batch
    * regime, where the flat store's full postings scan dominated
    * (SCALE.md, round-10 tier table). */
  def bm25TopKStored(six: Bm25StoredIndex, queries: DataFrame,
                     queryTextCol: String, queryIdCol: String,
                     k: Int = 10): DataFrame = {
    require(k > 0, s"k must be positive (got $k)")
    val terms = bm25QueryTerms(queries, queryTextCol, queryIdCol)
    val buckets = terms
      .select(pmod(xxhash64(col("token")), lit(six.nBuckets.toLong)).as("bucket"))
      .distinct().collect().map(_.getLong(0))
    val postings = six.postings
      .where(col("bucket").isin(buckets.map(b => b: Any): _*))
      .drop("bucket")
    val scored = terms.join(postings, Seq("token"))
    bm25Rank(scored, six.idCol, six.nDocs, six.totalTokens, six.k1, six.b, k)
  }

  /** Canonical content fingerprint: md5 of the sorted distinct token set.
    * Invariant to word order and duplication — catches shuffled/near-exact
    * copies that exact hashing misses. */
  /** Fraction of each document's tokens found in the corpus-wide top-N
    * vocabulary — the classic "common-word ratio" quality signal (a
    * Gopher-style filter: real prose is mostly frequent function words;
    * gibberish, code dumps and boilerplate are not).
    *
    * Two aggregations: the top-N vocabulary (corpus hash-agg, then a
    * TakeOrdered of N rows — never a global sort of the corpus) broadcast
    * into a map-side membership join over the exploded tokens, then one
    * hash-agg back to documents. Counts are exact integers, so the ratio
    * is bit-identical across engines. */
  def commonTokenRatio(df: DataFrame, textCol: String, idCol: String,
                       topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive (got $topN)")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
    val vocabTop = broadcast(
      Curation.vocabulary(df, textCol, minCount = 1L)
        .orderBy(col("freq").desc, col("token"))
        .limit(topN)
        .select(col("token"), lit(1).as("__hit")))
    toks.join(vocabTop, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_common"))
      .withColumn("common_ratio", col("n_common") / col("n_tokens"))
  }

  /** Per-document out-of-vocabulary rate against a reference vocabulary
    * — tokenizer/vocab QA before a training run (a corpus whose OOV
    * fraction jumps between snapshots is mis-tokenized, mis-languaged or
    * mis-scraped; gate on this next to [[graft.pipeline.Profile.drift]]).
    * `vocab` is any frame with a `token` column
    * ([[graft.pipeline.Curation.vocabulary]] output, or a fixed
    * tokenizer's vocab loaded from parquet) — entries are lowercased
    * here, since document tokens are lowercase by [[tokens]]'
    * canonicalization (a cased vocab would otherwise silently inflate
    * the OOV rate). Emits (idCol, n_tokens,
    * n_oov, oov_frac); documents with zero tokens emit 0/0/0.0, never
    * null/NaN. One token explode + a broadcast membership join + one
    * per-doc aggregate — the [[commonTokenRatio]] plan shape with the
    * hit test inverted. */
  def oovRate(df: DataFrame, textCol: String, idCol: String,
              vocab: DataFrame): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
    val known = broadcast(vocab.select(lower(col("token")).as("token"))
      .distinct().withColumn("__hit", lit(1)))
    val counted = toks.join(known, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_oov"))
    df.select(col(idCol)).join(counted, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        round(coalesce(col("n_oov") / col("n_tokens"), lit(0.0)), 6)
          .as("oov_frac"))
  }

  /** Markup strip for crawl ingest: drop `<...>` tags (replaced by a
    * space so `</p><p>` never glues words), decode the five predefined
    * HTML entities (`&lt; &gt; &quot; &#39;` first, `&amp;` LAST — so
    * a double-escaped `&amp;lt;` correctly yields the literal text
    * `&lt;`, decoded exactly once), collapse whitespace, trim. A pure
    * codegen regex/replace chain in the Java-regex ∩ RE2 common subset
    * like [[normalizeText]] — the scan IS the plan at 100 TB. Not an
    * HTML parser: script/style BODIES survive (tag-soup crawls need a
    * real extractor upstream); this is the cheap in-engine cleanup for
    * mostly-text payloads. */
  def stripMarkup(text: Column): Column = {
    val noTags = regexp_replace(text, "<[^>]*>", " ")
    val lt = regexp_replace(noTags, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&#39;", "'")
    val amp = regexp_replace(apos, "&amp;", "&")
    trim(regexp_replace(amp, "\\s+", " "))
  }

  /** Raw `href`/`src` attribute values, quoted or unquoted, in document
    * order (quoted matches first, then unquoted — the split is invisible
    * downstream because every consumer dedups). The unquoted arm
    * (VERDICT r17 item 2 — legacy HTML's `href=/page` is common in old
    * crawl strata and was silently dropped) terminates at whitespace,
    * `>`, a quote, or a backtick, the HTML5 unquoted-value alphabet; it
    * cannot double-capture a quoted value because the quote itself is
    * excluded from the first character. Both patterns live in the
    * Java-regex ∩ RE2 common subset so the DuckDB oracles replay them
    * verbatim. */
  // the unquoted arm writes [\s\x0B] instead of bare \s: Java's \s
  // includes vertical tab, RE2's (the DuckDB oracle's) does not, and a
  // bare-\s capture class would make the two engines capture DIFFERENT
  // text around a \x0B byte in real crawl data; the union class means
  // the same set on both
  private def attrUrlCandidates(html: Column): Column =
    concat(
      regexp_extract_all(html,
        lit("(?i)\\b(?:href|src)\\s*=\\s*[\"']([^\"']+)[\"']"), lit(1)),
      regexp_extract_all(html,
        lit("(?i)\\b(?:href|src)[\\s\\x0B]*=[\\s\\x0B]*([^\\s\\x0B\"'<>`]+)"),
        lit(1)))

  /** Outlink extraction for crawl curation: `href`/`src` attribute values
    * in the page markup (quoted or unquoted), kept when absolute
    * http(s), each normalized ([[normalizeUrl]]) and de-duplicated
    * within the document — the projection the URL-graph signals (link
    * dedup, domain frequency, PageRank-ish weighting) start from. A pure
    * codegen regexp/transform chain in the Java-regex ∩ RE2 common
    * subset like [[stripMarkup]]; at crawl scale the scan IS the plan.
    * Relative URLs skipped (resolution needs the base URI —
    * [[outlinksResolved]] is that variant) — the same mostly-well-formed
    * posture as stripMarkup. */
  def outlinks(html: Column): Column =
    array_distinct(transform(
      filter(attrUrlCandidates(html),
        u => u.rlike("(?i)^https?://")),
      u => normalizeUrl(u)))

  /** [[outlinks]] with RFC 3986 reference resolution against the page's
    * own URI ([[UrlResolve]]): real pages carry mostly RELATIVE links
    * (`img.png`, `../up`, `/rooted`, `?q=`, `//host/x`), which the
    * absolute-only extractor must skip — this resolves every quoted or
    * unquoted href/src against `baseUri` first, then applies the same
    * http(s)-filter + [[normalizeUrl]] + per-doc dedup. Still one
    * codegen'd scan-side projection. */
  def outlinksResolved(html: Column, baseUri: Column): Column =
    array_distinct(transform(
      filter(
        transform(attrUrlCandidates(html),
          u => UrlResolve.resolve(baseUri, u)),
        u => u.isNotNull && u.rlike("(?i)^https?://")),
      u => normalizeUrl(u)))

  /** Tracking-parameter strip for URL canonicalization: drops the
    * analytics params that make one page look like many
    * (`utm_*`, `gclid`, `fbclid`, `msclkid` — the standard
    * cross-pipeline blocklist), preserving the order of everything
    * else and the `?` only while params remain. Run AFTER
    * [[normalizeUrl]] (fragment already gone); pure codegen
    * split/filter/join in the Java-regex ∩ RE2 common subset. URL
    * dedup and frontier keys collapse once these are gone. */
  def stripTrackingParams(url: Column): Column = {
    val base = substring_index(url, "?", 1)
    val query = url.substr(length(base) + 2, length(url))
    val kept = filter(split(query, "&"),
      p => !p.rlike("(?i)^(utm_[a-z0-9_]*|gclid|fbclid|msclkid)="))
    when(!url.contains("?"), url)
      .otherwise(when(size(kept) > 0,
        concat(base, lit("?"), array_join(kept, "&")))
        .otherwise(base))
  }

  /** Page-level robots directives — the HTML side of the compliance
    * story next to the robots.txt gate ([[Curation.robotsGate]]):
    * `<meta name="robots" content="noindex, nofollow">` as a
    * `STRUCT<noindex BOOLEAN, nofollow BOOLEAN>`. Tags are cut with a
    * regex, but attribute READING is the [[HtmlAttr]] walk — a
    * `name=robots` substring inside some other attribute's quoted value
    * can never select a tag, and content token tests run on the actual
    * content VALUE only (round-18 review findings; the pure-regex form
    * had both false-gate modes). Token-boundary matching (a
    * `name="robotsx"` decoy does not gate), and the `none` directive
    * means noindex+nofollow per the robots-meta convention. The
    * transport-layer `X-Robots-Tag` equivalent composes directly from
    * the warc reader's `http_headers` map (`element_at(http_headers,
    * 'x-robots-tag')` + the same token test). */
  def robotsMeta(html: Column): Column = {
    val metas = filter(
      regexp_extract_all(html, lit("(?is)<meta\\b[^>]*>"), lit(0)),
      m => lower(trim(HtmlAttr.attr(m, lit("name")))) === "robots")
    // directives are COMMA-SEPARATED tokens (the robots-meta grammar):
    // exact token compare, never substring — 'none' inside
    // 'max-image-preview:none' is a different directive's VALUE and
    // must not gate (round-18 third-review finding)
    def directive(token: String): Column =
      exists(metas, m => coalesce(
        exists(split(lower(HtmlAttr.attr(m, lit("content"))), ","),
          t => trim(t) === token || trim(t) === "none"),
        lit(false)))
    struct(directive("noindex").as("noindex"),
      directive("nofollow").as("nofollow"))
  }

  /** [[outlinks]] restricted to FOLLOWED anchors: `<a>` tags whose
    * `rel` attribute VALUE (read with the [[HtmlAttr]] walk — never
    * matched inside other attributes' values) lacks the `nofollow`
    * token — the per-link opt-out that frontier building and PageRank
    * edges must respect; `src` resources are not hyperlink endorsements
    * and are out of scope here — use [[outlinks]] for asset fetching.
    * Hrefs read with the same walk (quoted or unquoted), then the usual
    * http(s) filter, normalization, per-doc dedup. */
  def outlinksFollow(html: Column): Column = {
    val anchors = filter(
      regexp_extract_all(html, lit("(?is)<a\\b[^>]*>"), lit(0)),
      a => !coalesce(lower(HtmlAttr.attr(a, lit("rel")))
        .rlike("\\bnofollow\\b"), lit(false)))
    val hrefs = transform(anchors, a => HtmlAttr.attr(a, lit("href")))
    array_distinct(transform(
      filter(hrefs, u => u.isNotNull && u.rlike("(?i)^https?://")),
      u => normalizeUrl(u)))
  }

  /** `rel=canonical` extraction — THE page-identity signal for URL-level
    * dedup: mirrors, tracking-param variants and session-id clones all
    * declare one canonical URL, and collapsing on it dedups what content
    * hashing then confirms. Reads `<link>` tags with the [[HtmlAttr]]
    * walk (a `rel=canonical` inside some other attribute's value never
    * matches), takes the FIRST canonical link (browser behavior),
    * resolves it against the page URI (canonicals are often relative),
    * filters to http(s), and normalizes. Null when the page declares no
    * canonical — callers typically `coalesce` to the page's own
    * normalized URI (no canonical = self). */
  def canonicalUrl(html: Column, baseUri: Column): Column = {
    val canon = filter(
      regexp_extract_all(html, lit("(?is)<link\\b[^>]*>"), lit(0)),
      l => coalesce(lower(HtmlAttr.attr(l, lit("rel")))
        .rlike("\\bcanonical\\b"), lit(false)))
    val resolved = UrlResolve.resolve(baseUri,
      HtmlAttr.attr(get(canon, lit(0)), lit("href")))
    when(resolved.isNotNull && resolved.rlike("(?i)^https?://"),
      normalizeUrl(resolved))
  }

  /** XML sitemap parsing (sitemaps.org protocol) — the hop after
    * [[Robots.sitemaps]] surfaces the `Sitemap:` URLs: given a fetched
    * sitemap body, extract its `<url>`/`<sitemap>` entries as
    * `ARRAY<STRUCT<loc STRING, lastmod STRING>>` (lastmod = '' when the
    * entry declares none), completing the robots → sitemaps → frontier
    * discovery chain real crawls use. Handles both `<urlset>` leaves
    * and `<sitemapindex>` indices (the block regex accepts either
    * element, so an index's child-sitemap URLs surface the same way).
    * `<loc>` values are trimmed and XML-entity-decoded (the five
    * predefined entities the protocol requires URLs to escape) and
    * non-http(s) locs are dropped. A pure codegen regexp/transform
    * chain in the Java-regex ∩ RE2 common subset — lazy block
    * quantifier included — so the DuckDB oracle replays it verbatim;
    * at crawl scale the scan IS the plan. */
  def sitemapEntries(xml: Column): Column =
    filter(
      transform(
        regexp_extract_all(xml,
          lit("(?is)<(?:url|sitemap)\\b[^>]*>(.*?)</(?:url|sitemap)[\\s\\x0B]*>"),
          lit(1)),
        // whitespace-bounded lazy captures, NOT trim(): SQL trim strips
        // spaces only, and sitemap locs are routinely newline-padded.
        // [\s\x0B] rather than bare \s so Java and RE2 (the oracle) mean
        // the same character set — Java's \s includes vertical tab
        b => struct(
          xmlUnescape(regexp_extract(b,
            "(?is)<loc[\\s\\x0B]*>[\\s\\x0B]*([^<]*?)[\\s\\x0B]*</loc", 1))
            .as("loc"),
          regexp_extract(b,
            "(?is)<lastmod[\\s\\x0B]*>[\\s\\x0B]*([^<]*?)[\\s\\x0B]*</lastmod",
            1).as("lastmod"))),
      e => e.getField("loc").rlike("(?i)^https?://"))

  /** Just the URLs of [[sitemapEntries]] — the frontier-feed projection. */
  def sitemapUrls(xml: Column): Column =
    transform(sitemapEntries(xml), _.getField("loc"))

  /** The five predefined XML entities, `&amp;` last (so `&amp;lt;`
    * decodes to the literal `&lt;`, not `<` — standard decode order). */
  private def xmlUnescape(s: Column): Column = {
    val lt = regexp_replace(s, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&apos;", "'")
    regexp_replace(apos, "&amp;", "&")
  }

  /** URL normalization for link-graph keys: scheme and authority
    * lowercase (case-insensitive per RFC 3986), default port strip
    * (`:80` http, `:443` https), fragment drop (never sent to the
    * server); path and query case preserved (case-SENSITIVE per spec). */
  def normalizeUrl(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val schemeAuth =
      lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", "")
    val joined = concat(schemeAuth, rest)
    regexp_replace(
      regexp_replace(joined, "^(http://[^/:?]*):80($|[/?])", "$1$2"),
      "^(https://[^/:?]*):443($|[/?])", "$1$2")
  }

  /** Canonical text normalization for ingest: control characters strip,
    * all whitespace runs collapse to single spaces, edges trim, and
    * (optionally) lowercase — the projection every downstream tokenizer
    * and hash assumes. Pure codegen regex chain in the Java-regex ∩ RE2
    * common subset; the 100 TB plan is the scan itself. */
  def normalizeText(text: Column, lowercase: Boolean = true): Column = {
    val stripped = regexp_replace(text, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", "")
    val collapsed = trim(regexp_replace(stripped, "\\s+", " "))
    if (lowercase) lower(collapsed) else collapsed
  }

  /** Per-document unigram log-probability under the corpus's own unigram
    * LM — the statistical quality signal next to the heuristic filters
    * (a document of rare/garbled tokens scores far below fluent prose;
    * the standard cheap stand-in for model-based perplexity filtering).
    *
    * Every token's `ln(freq/total)` is quantized to the 1e-6 grid as a
    * LONG, so the per-document sum is EXACT integer arithmetic —
    * order-independent under any partitioning (a raw double sum is not),
    * and bit-mirrorable by the oracle. The unigram table is corpus-built
    * (no OOV by construction) and joins broadcast. */
  /** Corpus-bigram LM document score — the n-gram step up from
    * [[unigramLogProb]] toward the KenLM-style perplexity filters used in
    * corpus curation: `sum over adjacent pairs of ln(freq(w1 w2) /
    * freq(w1 as history))`, the MLE bigram model fit on the corpus
    * itself. Self-scoring needs no smoothing (every scored bigram was
    * observed); docs with fewer than two tokens have no bigrams and drop
    * out. Log-probs quantize to the 1e-6 LONG grid like the unigram
    * score, so per-doc sums are exact order-independent integer
    * arithmetic. The bigram table broadcasts (fine while distinct
    * bigrams fit an executor; swap the join to a shuffle join for
    * open-vocabulary web corpora). */
  def bigramLogProb(df: DataFrame, textCol: String, idCol: String,
                    broadcastLm: Boolean = true): DataFrame = {
    // materialize the token array as a column FIRST: a transform lambda
    // that references the raw split expression re-tokenizes the text per
    // ELEMENT — O(tokens²) per doc, measured 14x on the same shape in
    // dsirSelect (SCALE.md round-10)
    val t = col("__t")
    // guard: sequence(1, 0) is DESCENDING in Spark — short docs must map
    // to an empty bigram list, not [1, 0]
    val bigramIdx = when(size(t) >= 2, sequence(lit(1), size(t) - 1))
      .otherwise(array().cast("array<int>"))
    // localCheckpoint: `pairs` feeds the bigram table, the history table
    // AND the final scoring join — left lazy, the tokenize+explode runs
    // three times (the same multi-consumer trap pplBuckets had one
    // level up; SCALE.md round-10)
    val pairs = df.select(col(idCol), tokens(col(textCol)).as("__t"))
      .select(col(idCol),
        explode(transform(bigramIdx, i =>
          struct(element_at(t, i.cast("int")).as("w1"),
            element_at(t, (i + 1).cast("int")).as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("__w1"), col("bg.w2").as("__w2"))
      .transform(mat)
    val bgFreq = pairs.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__f"))
    val histFreq = pairs.groupBy(col("__w1")).agg(count(lit(1)).as("__h"))
    // broadcastLm = false is the open-vocabulary escape hatch: the LM
    // grows with DISTINCT bigrams, and past ~1e6 of them the broadcast
    // build dominates (measured 12x at 100x docs — SCALE.md round-10);
    // the shuffle join keys both sides on the bigram instead
    val lmPlain = bgFreq.join(histFreq, Seq("__w1"))
      .select(col("__w1"), col("__w2"),
        round(log(col("__f") / col("__h")) * 1e6).cast("long").as("__lp_q"))
    val lm = if (broadcastLm) broadcast(lmPlain) else lmPlain
    pairs.join(lm, Seq("__w1", "__w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__lp_q")).as("__sum_q"))
      .select(col(idCol), col("n_bigrams"),
        (col("__sum_q") / 1e6).as("logprob"),
        (col("__sum_q") / 1e6 / col("n_bigrams")).as("avg_logprob"))
  }

  /** Interpolated Kneser–Ney bigram LM scoring (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated form with one fixed discount) —
    * the principled step up from [[bigramLogProb]]'s self-scored MLE:
    * the LM fits on a TRAIN corpus and scores held-out documents,
    * smoothing unseen bigrams with the continuation distribution
    * instead of dropping them:
    *
    *   P(w2|w1) = max(c(w1w2) − d, 0)/c(w1·)
    *              + d·N1+(w1·)/c(w1·) · (N1+(·w2)/N1+(··))
    *
    * with d = 0.75, falling back to the bare continuation probability
    * when w1 was never seen as a history. Tokens whose w2 was never
    * seen as a continuation have Pcont = 0 (P would be 0): they are
    * SKIPPED and counted (`n_oov`), the same
    * restrict-don't-fabricate contract as [[mooreLewisScore]].
    *
    * Exactness: every input to the probability is an exact integer
    * count; the formula is the same left-associated chain of IEEE ops
    * in both engines, and per-bigram `ln(P)` snaps to the 1e-6 BIGINT
    * grid before the exact per-doc sum. All four model tables broadcast
    * (vocab-bounded); scoring is one map-side join chain + hash agg. */
  def knBigramLogProb(df: DataFrame, textCol: String, idCol: String,
                      train: DataFrame, trainTextCol: String): DataFrame = {
    def bigrams(src: DataFrame, tCol: String, keep: Seq[Column]): DataFrame = {
      val t = col("__t")
      val bgIdx = when(size(t) >= 2, sequence(lit(1), size(t) - 1))
        .otherwise(array().cast("array<int>"))
      src.select(keep :+ tokens(col(tCol)).as("__t"): _*)
        .select(keep :+ explode(transform(bgIdx, i =>
          struct(element_at(t, i.cast("int")).as("w1"),
            element_at(t, (i + 1).cast("int")).as("w2")))).as("bg"): _*)
        .select(keep :+ col("bg.w1").as("__w1") :+ col("bg.w2").as("__w2"): _*)
    }
    // localCheckpoint: the bigram-count table feeds the history,
    // continuation and total tables AND the scoring join
    val bg = bigrams(train, trainTextCol, Seq.empty)
      .groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__c12"))
      .transform(mat)
    val hist = broadcast(bg.groupBy(col("__w1"))
      .agg(sum(col("__c12")).as("__h"), count(lit(1)).as("__n1w1")))
    val cont = broadcast(bg.groupBy(col("__w2"))
      .agg(count(lit(1)).as("__cont")))
    val tot = broadcast(bg.agg(count(lit(1)).as("__tot")))
    val p =
      when(col("__h").isNotNull,
        greatest(col("__c12c") - 0.75, lit(0.0)) / col("__h")
          + lit(0.75) * col("__n1w1") / col("__h") * (col("__cont") / col("__tot")))
        .otherwise(col("__cont") / col("__tot"))
    bigrams(df, textCol, Seq(col(idCol)))
      .join(broadcast(bg), Seq("__w1", "__w2"), "left")
      .join(hist, Seq("__w1"), "left")
      .join(cont, Seq("__w2"), "left")
      .crossJoin(tot)
      .withColumn("__c12c", coalesce(col("__c12"), lit(0L)))
      .withColumn("__lp_q",
        when(col("__cont").isNotNull, round(log(p) * 1e6).cast("long")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        count(col("__lp_q")).as("n_scored"),
        sum(coalesce(col("__lp_q"), lit(0L))).as("__sum_q"))
      .select(col(idCol), col("n_bigrams"), col("n_scored"),
        (col("__sum_q") / 1e6).as("logprob"),
        when(col("n_scored") > 0, col("__sum_q") / 1e6 / col("n_scored"))
          .otherwise(0.0).as("avg_logprob"))
  }

  /** CCNet-style perplexity bucketing: every document lands in the
    * `head` / `middle` / `tail` third of the corpus's LM-score
    * distribution (Wenzek et al. 2020 — the standard crawl triage where
    * `head` trains, `middle` is held for mixing, `tail` is dropped or
    * mined). Scored by [[bigramLogProb]]'s exact integer-quantized sum.
    *
    * Everything stays INTEGER so the bucket boundaries are bit-stable
    * across engines: the per-bigram average is floored onto a milli grid
    * via offset integer division (no float ratio), and the tercile
    * thresholds are order statistics read off a VALUE HISTOGRAM — group
    * by grid value, cumulative count, smallest value whose cumulative
    * count reaches ceil(n/3) / ceil(2n/3). The histogram is the scale
    * trick: its size is the number of DISTINCT grid values (bounded by
    * the grid, not the corpus), so the "global sort" is a window over a
    * tiny aggregate and the per-document pass is one broadcast-joined
    * projection — no corpus-wide sort at 100 TB. Docs with < 2 tokens
    * have no bigrams and drop out, like [[bigramLogProb]]. */
  def pplBuckets(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // offset keeps the dividend positive so truncating `div` == floor in
    // both engines; |sum_q*1000| stays far below 1e15 for any real doc
    // (and `logprob * 1e6` recovers the quantized sum exactly — that is
    // how bigramLogProb produced the column)
    // localCheckpoint: `scored` feeds the histogram, the total count AND
    // the final join — left lazy, the whole bigram-LM build re-runs once
    // per consumer (measured 153.8 s vs ~55 s for one LM pass at sf10;
    // SCALE.md round-10)
    val scored = bigramLogProb(df, textCol, idCol)
      .select(col(idCol), col("n_bigrams"),
        round(col("logprob") * 1e6).cast("long").as("__sum_q"))
      .withColumn("avg_lp_milli",
        expr("((__sum_q * 1000 + n_bigrams * 1000000000000000) div n_bigrams)" +
          " - 1000000000000000"))
      .transform(mat)
    val hist = scored.groupBy(col("avg_lp_milli")).agg(count(lit(1)).as("__c"))
    // the window is over the HISTOGRAM (distinct grid values), not the
    // corpus — the single-partition sort Spark warns about is deliberate
    // and bounded
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("avg_lp_milli"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cum = hist.withColumn("__cum", sum(col("__c")).over(w))
    val total = scored.agg(count(lit(1)).cast("long").as("__n"))
    val qs = cum.crossJoin(broadcast(total)).agg(
      min(when(col("__cum") * 3L >= col("__n"), col("avg_lp_milli"))).as("__q1"),
      min(when(col("__cum") * 3L >= col("__n") * 2L, col("avg_lp_milli"))).as("__q2"))
    scored.crossJoin(broadcast(qs))
      .select(col(idCol), col("n_bigrams"), col("avg_lp_milli"),
        when(col("avg_lp_milli") <= col("__q1"), "tail")
          .when(col("avg_lp_milli") <= col("__q2"), "middle")
          .otherwise("head").as("bucket"))
  }

  /** Moore–Lewis cross-entropy-difference selection (Moore & Lewis 2010,
    * "Intelligent Selection of Language Model Training Data"): score every
    * document by `log P_in(doc) − log P_gen(doc)` under two unigram MLE
    * LMs — one fit on an IN-DOMAIN exemplar set, one on the general
    * corpus itself — and keep the docs that look most like the domain.
    * The classic cheap data-selection signal this family's perplexity
    * scores feed into ([[unigramLogProb]] is the `P_gen` half alone).
    *
    * Exactness contract (the quantized-exact-sum family): each LM's
    * per-token `ln(freq/total)` snaps to the 1e-6 BIGINT grid, the
    * per-document score is the exact integer sum of `lp_in_q − lp_gen_q`
    * over tokens the in-domain LM knows; tokens OUTSIDE the in-domain
    * vocabulary contribute 0 and are counted (`n_tokens − n_scored`) —
    * Moore–Lewis restricts to the shared vocabulary rather than smooth,
    * so an OOV-heavy doc scores near 0 (ambiguous), not −∞. Docs with no
    * tokens drop out, like the rest of the LM family.
    *
    * Scale shape: two token scans + two hash-agg vocab builds; both LMs
    * broadcast (vocab-bounded, not corpus-bounded), scoring is one
    * map-side join + exact partial-aggregated sum — no corpus-wide
    * shuffle beyond the per-doc hash agg. */
  def mooreLewisScore(df: DataFrame, textCol: String, idCol: String,
                      inDomain: DataFrame, inTextCol: String): DataFrame = {
    // localCheckpoint: `toks` feeds the general vocab AND the scoring join
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .transform(mat)
    def lm(t: DataFrame, lpName: String): DataFrame = {
      val v = t.groupBy(col("token")).agg(count(lit(1)).as("freq"))
      val tot = v.agg(sum(col("freq")).as("__total"))
      v.crossJoin(broadcast(tot)).select(col("token"),
        round(log(col("freq") / col("__total")) * 1e6).cast("long").as(lpName))
    }
    val genLm = broadcast(lm(toks, "__lp_gen"))
    val inLm = broadcast(lm(
      inDomain.select(explode(tokens(col(inTextCol))).as("token"))
        .where(length(col("token")) > 0), "__lp_in"))
    toks.join(genLm, Seq("token"))
      .join(inLm, Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(col("__lp_in")).as("n_scored"),
        sum(when(col("__lp_in").isNotNull, col("__lp_in") - col("__lp_gen"))
          .otherwise(0L)).as("__sum_q"))
      .select(col(idCol), col("n_tokens"), col("n_scored"),
        (col("__sum_q") / 1e6).as("score"),
        when(col("n_scored") > 0, col("__sum_q") / 1e6 / col("n_scored"))
          .otherwise(0.0).as("avg_score"))
  }

  def unigramLogProb(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // localCheckpoint: `toks` feeds the vocabulary AND the scoring join
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .transform(mat)
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("freq"))
    val total = vocab.agg(sum(col("freq")).as("__total"))
    val lm = broadcast(vocab.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("freq") / col("__total")) * 1e6).cast("long").as("__lp_q")))
    toks.join(lm, Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lp_q")).as("__sum_q"))
      .select(col(idCol), col("n_tokens"),
        (col("__sum_q") / 1e6).as("logprob"),
        (col("__sum_q") / 1e6 / col("n_tokens")).as("avg_logprob"))
  }

  // ------------------------------------------------------------ redaction

  /** PII-redaction patterns, ordered: URLs first (an email inside a URL
    * must redact as part of the URL), then emails, then dotted-quad IPs.
    * Every pattern stays inside the Java-regex ∩ RE2 common subset —
    * character classes, bounded repetition, `\b` — so the DuckDB oracle
    * applies literally the same strings with `regexp_replace(..., 'g')`. */
  val redactionPatterns: Seq[(String, String)] = Seq(
    "https?://[^\\s]+" -> "<URL>",
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+" -> "<EMAIL>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>")

  /** Redacted text: the patterns applied in table order, all occurrences.
    * A pure narrow projection (codegen'd `RegExpReplace` chain) — the
    * 100 TB plan is the parquet scan itself. */
  def redact(text: Column): Column =
    redactionPatterns.foldLeft(text) { case (acc, (pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }

  /** Per-pattern match counts (before redaction), same order; used for
    * corpus PII telemetry and for filters like "drop documents with > k
    * contact strings". */
  def redactionCounts(df: DataFrame, textCol: String): DataFrame = {
    // count each pattern on the PARTIALLY-redacted text, exactly as the
    // sequential redaction sees it (an email inside a URL counts as URL)
    val staged = redactionPatterns.inits.toSeq.reverse.map(ps =>
      ps.foldLeft(col(textCol)) { case (acc, (pat, tag)) => regexp_replace(acc, pat, tag) })
    df.withColumn("n_urls", regexp_count(staged(0), lit(redactionPatterns(0)._1)))
      .withColumn("n_emails", regexp_count(staged(1), lit(redactionPatterns(1)._1)))
      .withColumn("n_ips", regexp_count(staged(2), lit(redactionPatterns(2)._1)))
  }

  // ---------------------------------------------------------- fingerprint

  def fingerprintMd5(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Winnowing fingerprints (rolling-hash document sketch): hash every
    * k-char window, then keep the minimum hash of each `window`-sized run
    * (the MOSS/winnowing scheme). Distinct minima form the sketch. Pure
    * higher-order expressions — no UDF, no shuffle. */
  def winnowFingerprints(text: Column, k: Int = 5, window: Int = 4,
                         useMd5: Boolean = false): Column =
    graft.fuzzy.vectorFunctions.winnow_sketch(lower(trim(text)), k, window, useMd5)

  /** Per-document Shannon entropy of the character and token
    * distributions — the gibberish / compression-artifact / template
    * detector next to [[qualityScore]] (near-zero char entropy = byte
    * runs and boilerplate; abnormally high = base64/binary spill;
    * near-zero token entropy = repeated-phrase spam). Both ride the
    * quantized-exact-sum recipe: H = ln(n) − (Σ c·ln c)/n with each
    * per-symbol term `round(c·ln(c)·1e6)` landed on the BIGINT grid
    * BEFORE the per-document sum, so the aggregate is order-independent
    * and engine-replayable (the BM25/LM float discipline). Two explode +
    * hash-agg pipelines (chars, whitespace tokens) left-joined back to
    * the id spine: every input doc emits exactly one row, empty/null
    * text as (0, 0, 0.0). Entropies are in nats, rounded to 6. */
  def entropyProfile(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    def half(sym: Column, prefix: String): DataFrame = {
      val counts = df
        .select(col(idCol), explode(sym).as("__s"))
        .where(length(col("__s")) > 0)
        .groupBy(col(idCol), col("__s"))
        .agg(count(lit(1)).as("__c"))
      counts
        .select(col(idCol), col("__c"),
          round(col("__c").cast("double") * log(col("__c").cast("double")) * 1e6)
            .cast("long").as("__t"))
        .groupBy(col(idCol))
        .agg(sum(col("__c")).as(s"n_$prefix"),
          count(lit(1)).as(s"n_distinct_$prefix"),
          sum(col("__t")).as("__ts"))
        .select(col(idCol), col(s"n_$prefix"), col(s"n_distinct_$prefix"),
          round(log(col(s"n_$prefix").cast("double")) -
            col("__ts").cast("double") / 1e6 / col(s"n_$prefix").cast("double"), 6)
            .as(s"${prefix}_entropy"))
    }
    val chars = half(split(txt, ""), "chars")
    val toks = half(split(trim(lower(txt)), "\\s+"), "tokens")
    df.select(col(idCol))
      .join(chars, Seq(idCol), "left")
      .join(toks, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_chars"), lit(0L)).as("n_chars"),
        coalesce(col("n_distinct_chars"), lit(0L)).as("n_distinct_chars"),
        coalesce(col("chars_entropy"), lit(0.0)).as("char_entropy"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct_tokens"), lit(0L)).as("n_distinct_tokens"),
        coalesce(col("tokens_entropy"), lit(0.0)).as("token_entropy"))
  }

  /** DuckDB replay of [[entropyProfile]] — same per-symbol micro-grid
    * terms, same integer sums, same left-join spine. */
  def entropyProfileOracleSql(table: String, textCol: String,
                              idCol: String): String =
    s"""WITH ch AS (SELECT $idCol, unnest(string_split(coalesce($textCol, ''), '')) AS s
              FROM $table),
       chc AS (SELECT $idCol, s, count(*) AS c FROM ch WHERE length(s) > 0 GROUP BY 1, 2),
       che AS (SELECT $idCol, sum(c) AS n_chars, count(*) AS n_distinct_chars,
                 round(ln(CAST(sum(c) AS DOUBLE)) -
                   CAST(sum(CAST(round(c * ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)) AS DOUBLE)
                     / 1000000.0 / sum(c), 6) AS char_entropy
               FROM chc GROUP BY 1),
       tk AS (SELECT $idCol, unnest(string_split_regex(trim(lower(coalesce($textCol, ''))), '\\s+')) AS s
              FROM $table),
       tkc AS (SELECT $idCol, s, count(*) AS c FROM tk WHERE length(s) > 0 GROUP BY 1, 2),
       tke AS (SELECT $idCol, sum(c) AS n_tokens, count(*) AS n_distinct_tokens,
                 round(ln(CAST(sum(c) AS DOUBLE)) -
                   CAST(sum(CAST(round(c * ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT)) AS DOUBLE)
                     / 1000000.0 / sum(c), 6) AS token_entropy
               FROM tkc GROUP BY 1)
       SELECT d.$idCol,
         CAST(coalesce(che.n_chars, 0) AS BIGINT) AS n_chars,
         CAST(coalesce(che.n_distinct_chars, 0) AS BIGINT) AS n_distinct_chars,
         coalesce(che.char_entropy, 0.0) AS char_entropy,
         CAST(coalesce(tke.n_tokens, 0) AS BIGINT) AS n_tokens,
         CAST(coalesce(tke.n_distinct_tokens, 0) AS BIGINT) AS n_distinct_tokens,
         coalesce(tke.token_entropy, 0.0) AS token_entropy
       FROM $table d LEFT JOIN che ON d.$idCol = che.$idCol
         LEFT JOIN tke ON d.$idCol = tke.$idCol"""

  /** Code-likeness signal for prose/code routing in a training mix —
    * the structural counterpart of [[qualityScore]]'s prose heuristics:
    * code announces itself with bracket/semicolon/assignment density
    * and indented-line structure long before any tokenizer runs.
    * Emits the raw integer counts (lines, indented lines, code symbols,
    * non-space chars), the two ratios, and a [0,1] composite
    * `0.5·min(1, 5·symbol_ratio) + 0.5·min(1, 3·indent_ratio)` —
    * transparent fixed weights, every term derived from exact integer
    * counts so the round-6 doubles replay in any engine. One codegen
    * projection: no explode, no shuffle, scan-speed at 100 TB. */
  def codeScore(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val lines = split(txt, "\n")
    val nLines = size(lines).cast("long")
    val nIndent = size(filter(lines, l => l.rlike("^(  |\t)"))).cast("long")
    val nSym = (length(txt) -
      length(regexp_replace(txt, "[{}()\\[\\];=]", ""))).cast("long")
    // Explicit whitespace class (NOT \s): Java's \s includes \x0B but
    // RE2's does not — spell the set identically here and in the oracle
    // so a vertical tab cannot drift n_nonspace (scriptRanges discipline).
    val nNonspace = length(regexp_replace(txt, "[ \\t\\n\\x0B\\f\\r]", "")).cast("long")
    val symRatio = round(nSym.cast("double") /
      greatest(nNonspace, lit(1L)).cast("double"), 6)
    val indentRatio = round(nIndent.cast("double") / nLines.cast("double"), 6)
    df.select(col(idCol), nLines.as("n_lines"), nIndent.as("n_indent_lines"),
      nSym.as("n_code_symbols"), nNonspace.as("n_nonspace"),
      symRatio.as("symbol_ratio"), indentRatio.as("indent_ratio"),
      round(least(lit(1.0), symRatio * 5) * 0.5 +
        least(lit(1.0), indentRatio * 3) * 0.5, 6).as("code_score"))
  }

  /** DuckDB replay of [[codeScore]] — same counts, ratios, weights. */
  def codeScoreOracleSql(table: String, textCol: String, idCol: String): String =
    s"""WITH c AS (SELECT $idCol,
             string_split(coalesce($textCol, ''), chr(10)) AS ls,
             coalesce($textCol, '') AS tx
           FROM $table),
       k AS (SELECT $idCol,
             CAST(len(ls) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ls, l -> regexp_matches(l, '^(  |\t)'))) AS BIGINT) AS n_indent_lines,
             CAST(length(tx) - length(regexp_replace(tx, '[{}()\\[\\];=]', '', 'g')) AS BIGINT) AS n_code_symbols,
             CAST(length(regexp_replace(tx, '[ \\t\\n\\x0B\\f\\r]', '', 'g')) AS BIGINT) AS n_nonspace
           FROM c)
       SELECT $idCol, n_lines, n_indent_lines, n_code_symbols, n_nonspace,
         round(CAST(n_code_symbols AS DOUBLE) / greatest(n_nonspace, 1), 6) AS symbol_ratio,
         round(CAST(n_indent_lines AS DOUBLE) / n_lines, 6) AS indent_ratio,
         round(least(1.0, round(CAST(n_code_symbols AS DOUBLE) / greatest(n_nonspace, 1), 6) * 5) * 0.5 +
               least(1.0, round(CAST(n_indent_lines AS DOUBLE) / n_lines, 6) * 3) * 0.5, 6) AS code_score
       FROM k"""

  /** Unicode-script character classes by EXPLICIT code-point ranges —
    * deliberately not `\p{script=...}` properties, whose member sets
    * depend on each engine's Unicode table version; fixed ranges behave
    * identically in Java regex and RE2/DuckDB, so the counts replay
    * bit-for-bit. Ranges cover each script's core block (the crawl-triage
    * signal), not its full Unicode closure. */
  private[graft] val scriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z\\u00C0-\\u024F",
    "cyrillic" -> "\\u0400-\\u04FF",
    "greek" -> "\\u0370-\\u03FF",
    "arabic" -> "\\u0600-\\u06FF",
    "hebrew" -> "\\u0590-\\u05FF",
    "devanagari" -> "\\u0900-\\u097F",
    "cjk" -> "\\u3040-\\u30FF\\u4E00-\\u9FFF",
    "hangul" -> "\\uAC00-\\uD7AF",
    "digit" -> "0-9")

  /** Per-document Unicode-script profile — the crawl-triage signal next
    * to the n-gram [[langId]] (script is cheaper and catches what
    * marker-word language ID cannot: wrong-script injection inside a
    * right-language page, mixed-script spam, mislabeled CJK). Counts
    * characters per script class (explicit code-point ranges, see
    * [[scriptRanges]]), then the dominant LETTER script (digits
    * excluded) with ties broken alphabetically, and its share of all
    * script-classified letters. Documents with no classified letters
    * report dominant "none" at ratio 0. One codegen projection —
    * counting is `length(x) - length(regexp_replace(x, cls, ''))`, no
    * explode, no shuffle, scan-speed at 100 TB. */
  def scriptProfile(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // NULL text profiles as empty (all-zero counts, dominant "none") —
    // the engine-wide no-nullable-output convention
    val txt = coalesce(col(textCol), lit(""))
    val counts = scriptRanges.map { case (name, ranges) =>
      name -> (length(txt) -
        length(regexp_replace(txt, s"[$ranges]", ""))).cast("long")
    }
    val letters = counts.filterNot(_._1 == "digit")
    val total = letters.map(_._2).reduce(_ + _)
    // deterministic argmax: fold in REVERSE alphabetical order with >=,
    // so an earlier name wins ties
    val (n0, c0) = letters.sortBy(_._1).reverse.head
    val (domName, domCount) = letters.sortBy(_._1).reverse.tail
      .foldLeft((lit(n0), c0)) { case ((bn, bc), (n, c)) =>
        (when(c >= bc, lit(n)).otherwise(bn), when(c >= bc, c).otherwise(bc))
      }
    df.select(Seq(col(idCol)) ++
      counts.map { case (n, c) => c.as(s"n_$n") } ++ Seq(
      total.as("n_script_chars"),
      when(total === 0, "none").otherwise(domName).as("dominant_script"),
      when(total === 0, 0.0)
        .otherwise(round(domCount.cast("double") / total.cast("double"), 6))
        .as("dominant_ratio")): _*)
  }

  /** DuckDB replay of [[scriptProfile]], GENERATED from the same
    * [[scriptRanges]] table — the class definitions cannot drift between
    * the implementation and the oracle. */
  def scriptProfileOracleSql(table: String, textCol: String,
                             idCol: String): String = {
    // Java regex spells a BMP code point \uXXXX; RE2 (DuckDB) spells it
    // \x{XXXX} — same ranges, translated mechanically
    def re(ranges: String): String =
      "\\\\u([0-9A-Fa-f]{4})".r.replaceAllIn(ranges, m => s"\\\\x{${m.group(1)}}")
    val cnt = scriptRanges.map { case (name, ranges) =>
      s"length(coalesce($textCol, '')) - length(regexp_replace(coalesce($textCol, ''), '[${re(ranges)}]', '', 'g')) AS n_$name"
    }.mkString(",\n                ")
    val letters = scriptRanges.map(_._1).filterNot(_ == "digit").sorted
    val total = letters.map("n_" + _).mkString(" + ")
    val domPairs = letters.map(n => s"(SELECT 'KEY' AS s, n_KEY AS c)".replace("KEY", n))
    s"""WITH c AS (SELECT $idCol,
                $cnt
              FROM $table),
       t AS (SELECT *, $total AS n_script_chars FROM c),
       d AS (SELECT $idCol, s AS dominant_script, c AS dom_count,
               row_number() OVER (PARTITION BY $idCol ORDER BY c DESC, s) AS rn
             FROM t, LATERAL (${domPairs.mkString(" UNION ALL ")}) AS l(s, c))
       SELECT t.$idCol, ${scriptRanges.map(r => s"CAST(t.n_${r._1} AS BIGINT) AS n_${r._1}").mkString(", ")},
              CAST(t.n_script_chars AS BIGINT) AS n_script_chars,
              CASE WHEN t.n_script_chars = 0 THEN 'none' ELSE d.dominant_script END AS dominant_script,
              CASE WHEN t.n_script_chars = 0 THEN 0.0
                   ELSE round(CAST(d.dom_count AS DOUBLE) / t.n_script_chars, 6) END AS dominant_ratio
       FROM t JOIN d ON t.$idCol = d.$idCol AND d.rn = 1"""
  }
}
