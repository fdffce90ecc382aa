package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable export of the learned classifiers in [[QualityModel]]:
  * quantize the fitted weights onto an integer micro-grid (1e-6), apply
  * them with a pure codegen plan whose per-document dot products are
  * BIGINT sums — exact, order-independent, bit-reproducible under any
  * partitioning — and generate the DuckDB SQL that replays the SAME
  * scoring end to end, murmur3 featurization included.
  *
  * Why this exists: the fit itself (L-BFGS) is not SQL-expressible, so
  * `fitHashedClassifier`/`fitLangId` are spec-gated. But the APPLY half —
  * the thing that actually touches 100 TB — is pure linear algebra over
  * `tf_slot` counts, and once the weights are exported as literals it IS
  * oracle-checkable. The one non-trivial piece is the featurizer:
  * HashingTF's slot function is murmur3_x86_32 over UTF-8 bytes
  * (seed 42, `hashUnsafeBytes2` tail handling), which DuckDB lacks — so
  * [[tfSlotCtes]] generates a recursive-CTE replay of the hash over
  * hex-decoded bytes, exact to the bit (validated term-for-term against
  * `VectorKernels.tfSlot`, multibyte UTF-8 included; see
  * ModelExportSpec).
  *
  * Scale shape of the apply plans: one scan, one explode, one hash
  * aggregate keyed by the document id (map-side combined); the weight
  * vectors ride the plan as Array[Long] literals exactly like the IVF
  * centroid arrays. Nothing but a scan at 100 TB.
  *
  * Reference anchor: the reference ships no learned models (its scoring
  * is the six fuzzy kernels, matcher.py:1-100); this module is part of
  * the training-data-pipeline extension surface.
  */
object ModelExport {

  /** Binary quality model on the 1e-6 integer grid. */
  final case class QuantizedLinearModel(weightsMicro: Array[Long],
                                        interceptMicro: Long, slots: Int) {
    require(weightsMicro.length == slots,
      s"${weightsMicro.length} weights for $slots slots")
  }

  /** Multiclass langid model on the 1e-6 integer grid; `labels` sorted,
    * class index order pinned to it (same contract as
    * [[QualityModel.LangIdModel]]). */
  final case class QuantizedLangIdModel(weightsMicro: Array[Array[Long]],
                                        interceptsMicro: Array[Long],
                                        labels: Array[String],
                                        slots: Int, ngramLen: Int) {
    require(weightsMicro.length == labels.length &&
      interceptsMicro.length == labels.length &&
      weightsMicro.forall(_.length == slots), "QuantizedLangIdModel shape")
    require(labels.sorted.sameElements(labels), "labels must be sorted")
    // mirrors fitLangId's guard: a 1-class "classifier" is meaningless,
    // and the apply plan's greatest() needs >= 2 score columns anyway —
    // fail at construction with a clear message, not at analysis time
    require(labels.length >= 2, s"need >= 2 labels (got ${labels.toSeq})")
  }

  private val Grid = 1000000L

  /** Snap a fitted model to the micro-grid. The quantization error is
    * <= 5e-7 per weight — far below the model's own generalization
    * noise — and it buys exact cross-engine reproducibility. */
  def quantize(m: QualityModel.HashedModel): QuantizedLinearModel =
    QuantizedLinearModel(m.weights.map(w => math.round(w * Grid)),
      math.round(m.intercept * Grid), m.slots)

  def quantize(m: QualityModel.LangIdModel): QuantizedLangIdModel =
    QuantizedLangIdModel(m.weights.map(_.map(w => math.round(w * Grid))),
      m.intercepts.map(i => math.round(i * Grid)), m.labels, m.slots,
      m.ngramLen)

  private def sigmoidMicro(dotMicro: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-(dotMicro.cast("double") / lit(Grid.toDouble))))

  /** Score a corpus with a quantized model: explode the (element-wise
    * empty-filtered) whitespace tokens, sum each token's micro-weight
    * per document in ONE BIGINT hash aggregate, sigmoid last. One row
    * per input doc ALWAYS — empty/whitespace/NULL text rides
    * `explode_outer` to a null-token row whose weight sum nulls out and
    * coalesces to 0 = `sigmoid(intercept)` (the
    * [[QualityModel.applyHashedModel]] contract, kept bit-exact here). */
  def applyQuantized(df: DataFrame, textCol: String, idCol: String,
                     m: QuantizedLinearModel): DataFrame = {
    df.select(col(idCol), explode_outer(
        filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0)).as("__tok"))
      .select(col(idCol), element_at(lit(m.weightsMicro),
        graft.fuzzy.vectorFunctions.tf_slot(col("__tok"), m.slots)
          .cast("int") + 1).as("__w"))
      .groupBy(col(idCol)).agg(sum(col("__w")).as("__dot"))
      .select(col(idCol),
        sigmoidMicro(coalesce(col("__dot"), lit(0L)) + lit(m.interceptMicro))
          .as("quality_prob"))
  }

  /** Classify a corpus with a quantized langid model: char-n-gram
    * explode, k BIGINT weight sums in one aggregate, integer argmax
    * (ties to the lexicographically-smaller label — labels are sorted
    * and the FIRST class attaining the max wins), softmax probability
    * of the winner last. The argmax is over exact integers, so the
    * prediction is bit-stable across engines and partitionings; only
    * the probability touches floating point (round at the consumer). */
  def applyLangIdQuantized(df: DataFrame, textCol: String, idCol: String,
                           m: QuantizedLangIdModel): DataFrame = {
    val k = m.labels.length
    val dots = df
      .select(col(idCol), explode_outer(graft.fuzzy.vectorFunctions.char_ngrams(
        lower(trim(col(textCol))), m.ngramLen)).as("__g"))
      .select(col(idCol),
        graft.fuzzy.vectorFunctions.tf_slot(col("__g"), m.slots)
          .cast("int").as("__slot"))
      .groupBy(col(idCol))
      .agg(sum(element_at(lit(m.weightsMicro(0)), col("__slot") + 1)).as("__d0"),
        (1 until k).map(c =>
          sum(element_at(lit(m.weightsMicro(c)), col("__slot") + 1))
            .as(s"__d$c")): _*)
    val scored = dots.select(col(idCol) +: (0 until k).map(c =>
      (coalesce(col(s"__d$c"), lit(0L)) + lit(m.interceptsMicro(c)))
        .as(s"__s$c")): _*)
    val maxScore = greatest((0 until k).map(c => col(s"__s$c")): _*)
    val predIx = (k - 1 to 0 by -1).foldLeft(lit(-1)) { case (acc, c) =>
      when(col(s"__s$c") === maxScore, c).otherwise(acc)
    }
    // denominator term order pinned to class order (matches the oracle's
    // generated `exp(..0..) + exp(..1..) + ...` exactly — the only FP
    // divergence left is exp itself, 1 ulp)
    val expSum = (0 until k).map(c =>
      exp((col(s"__s$c") - maxScore).cast("double") / lit(Grid.toDouble)))
      .reduce(_ + _)
    scored.select(col(idCol),
      element_at(lit(m.labels), predIx + 1).as("lang_pred"),
      (lit(1.0) / expSum).as("lang_prob"))
  }

  // ------------------------------------------------------------------
  // Stored-model lifecycle (the serving artifact, like the stored BM25
  // index): quantized models persist as one-row parquet — integer
  // weights round-trip exactly, so a loaded model scores bit-identically
  // to the one that was saved, on any engine that reads parquet.
  // ------------------------------------------------------------------

  def save(m: QuantizedLinearModel, path: String,
           spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    Seq((m.weightsMicro.toSeq, m.interceptMicro, m.slots))
      .toDF("weights_micro", "intercept_micro", "slots")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadLinear(spark: org.apache.spark.sql.SparkSession,
                 path: String): QuantizedLinearModel = {
    val r = spark.read.parquet(path).head()
    // collection.Seq: Row.getAs hands back mutable ArraySeq wrappers
    QuantizedLinearModel(
      r.getAs[scala.collection.Seq[Long]]("weights_micro").toArray,
      r.getAs[Long]("intercept_micro"), r.getAs[Int]("slots"))
  }

  def save(m: QuantizedLangIdModel, path: String,
           spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    Seq((m.weightsMicro.map(_.toSeq).toSeq, m.interceptsMicro.toSeq,
        m.labels.toSeq, m.slots, m.ngramLen))
      .toDF("weights_micro", "intercepts_micro", "labels", "slots", "ngram_len")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadLangId(spark: org.apache.spark.sql.SparkSession,
                 path: String): QuantizedLangIdModel = {
    val r = spark.read.parquet(path).head()
    QuantizedLangIdModel(
      r.getAs[scala.collection.Seq[scala.collection.Seq[Long]]]("weights_micro")
        .map(_.toArray).toArray,
      r.getAs[scala.collection.Seq[Long]]("intercepts_micro").toArray,
      r.getAs[scala.collection.Seq[String]]("labels").toArray,
      r.getAs[Int]("slots"), r.getAs[Int]("ngram_len"))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle generation
  // ------------------------------------------------------------------

  private def mulM(a: String, b: String): String =
    s"CAST((CAST(($a) AS HUGEINT) * ($b)) % 4294967296 AS BIGINT)"
  private def rotl(x: String, r: Int): String =
    s"(((($x) * ${1L << r}) % 4294967296) + (($x) // ${1L << (32 - r)}))"
  private def mixK1(k: String): String =
    mulM(rotl(mulM(k, "3432918353"), 15), "461845907")
  private def mixH1(h: String, k: String): String =
    s"(((${rotl(s"xor($h, $k)", 13)}) * 5 + 3864292196) % 4294967296)"
  private def byteAt(pos0: String): String =
    s"((strpos('0123456789ABCDEF', substr(hx, 2*($pos0)+1, 1)) - 1) * 16 + " +
      s"(strpos('0123456789ABCDEF', substr(hx, 2*($pos0)+2, 1)) - 1))"

  /** CTE chain replaying `tf_slot` in DuckDB: consumes a CTE
    * `toks(..., token)`, defines `sl(token, slot)` over its DISTINCT
    * tokens. Murmur3_x86_32 `hashUnsafeBytes2` (Spark's HashingTF
    * variant, seed 42): 4-byte little-endian words mixed through a
    * recursive CTE, trailing 1-3 bytes accumulated little-endian into
    * one final mix, fmix with the byte length, then `nonNegativeMod`.
    * All 32-bit arithmetic on BIGINT mod 2^32 (products via HUGEINT);
    * bytes come from `hex(encode(token))` so multibyte UTF-8 hashes
    * identically to the JVM's UTF8String bytes. The whole chain costs
    * O(distinct tokens x token bytes / 4) recursion steps. */
  def tfSlotCtes(slots: Int): String = {
    val word = (0 until 4).map(i =>
      s"${1L << (8 * i)} * ${byteAt(s"4*j+$i")}").mkString(" + ")
    val la = "(nb - nb % 4)"
    val tailk1 =
      s"""CASE nb % 4 WHEN 0 THEN 0
         |      WHEN 1 THEN ${byteAt(la)}
         |      WHEN 2 THEN ${byteAt(la)} + 256 * ${byteAt(s"$la+1")}
         |      ELSE ${byteAt(la)} + 256 * ${byteAt(s"$la+1")} + 65536 * ${byteAt(s"$la+2")} END""".stripMargin
    s"""dist AS (SELECT DISTINCT token FROM toks),
       |bs AS (SELECT token, hex(encode(token)) AS hx,
       |              octet_length(encode(token)) AS nb FROM dist),
       |mm(token, hx, nb, nwords, j, h) AS (
       |  SELECT token, hx, nb, nb // 4, 0, CAST(42 AS BIGINT) FROM bs
       |  UNION ALL
       |  SELECT token, hx, nb, nwords, j + 1, ${mixH1("h", "k1")}
       |  FROM (SELECT token, hx, nb, nwords, j, h, ${mixK1("w")} AS k1
       |        FROM (SELECT token, hx, nb, nwords, j, h, $word AS w
       |              FROM mm WHERE j < nwords))
       |),
       |tl AS (SELECT token, nb, xor(h, ${mixK1("tk")}) AS h
       |       FROM (SELECT token, nb, h, $tailk1 AS tk FROM mm WHERE j = nwords)),
       |f1 AS (SELECT token, xor(h, nb) AS h FROM tl),
       |f2 AS (SELECT token, xor(h, h // 65536) AS h FROM f1),
       |f3 AS (SELECT token, ${mulM("h", "2246822507")} AS h FROM f2),
       |f4 AS (SELECT token, xor(h, h // 8192) AS h FROM f3),
       |f5 AS (SELECT token, ${mulM("h", "3266489909")} AS h FROM f4),
       |f6 AS (SELECT token, xor(h, h // 65536) AS h FROM f5),
       |sl AS (SELECT token,
       |  ((((CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END) % $slots)
       |    + $slots) % $slots) AS slot FROM f6)""".stripMargin
  }

  private def longList(ws: Array[Long]): String =
    ws.mkString("[", ", ", "]")

  /** DuckDB replay of [[applyQuantized]] over `table(idCol, textCol)`:
    * same tokenization, same murmur slots, same BIGINT dot, same
    * sigmoid, rounded to `dp`. */
  def qualityApplyOracleSql(table: String, textCol: String, idCol: String,
                            m: QuantizedLinearModel, dp: Int = 6): String = {
    s"""WITH RECURSIVE
       |toks AS (SELECT $idCol AS id,
       |  unnest(list_filter(string_split_regex(trim(lower($textCol)), '\\s+'),
       |                     x -> length(x) > 0)) AS token
       |  FROM $table),
       |${tfSlotCtes(m.slots)},
       |w AS (SELECT unnest(generate_series(0, ${m.slots - 1})) AS slot,
       |             unnest(${longList(m.weightsMicro)}) AS wv),
       |dt AS (SELECT t.id, sum(w.wv) AS dm
       |       FROM toks t JOIN sl USING (token) JOIN w USING (slot)
       |       GROUP BY t.id)
       |SELECT d.$idCol, round(1.0 / (1.0 +
       |    exp(-(CAST(coalesce(dt.dm, 0) + ${m.interceptMicro} AS DOUBLE)
       |          / 1000000.0))), $dp) AS quality_prob
       |FROM $table d LEFT JOIN dt ON d.$idCol = dt.id""".stripMargin
  }

  /** DuckDB replay of [[applyLangIdQuantized]]: char-n-gram listing via
    * `list_transform(generate_series(...))` (with the short-string
    * collapse to the whole string), murmur slots, k BIGINT dots as
    * columns, integer argmax with first-class-wins tie-break, softmax
    * with the denominator terms in class order.
    *
    * Exactness boundary: the murmur3 HASH of any given token is
    * bit-exact for arbitrary UTF-8 (tfSlotCtes hashes bytes), but the
    * n-gram WINDOWING differs for supplementary-plane text — Spark's
    * `charNgrams` slides over Java UTF-16 code units while DuckDB's
    * `substr`/`length` count code points, so an astral character (emoji
    * etc.) windows differently. This is the repo-wide char-gram oracle
    * convention (the winnow/fingerprint oracles share it); the driver
    * corpus is BMP-only, where the two coincide. */
  def langIdApplyOracleSql(table: String, textCol: String, idCol: String,
                           m: QuantizedLangIdModel, dp: Int = 6): String = {
    val k = m.labels.length
    val n = m.ngramLen
    val wCols = (0 until k).map(c =>
      s"unnest(${longList(m.weightsMicro(c))}) AS wv$c").mkString(",\n             ")
    val dCols = (0 until k).map(c => s"sum(w.wv$c) AS d$c").mkString(", ")
    val sCols = (0 until k).map(c =>
      s"coalesce(dt.d$c, 0) + ${m.interceptsMicro(c)} AS s$c").mkString(",\n       ")
    val best = (0 until k).map(c => s"s$c").mkString("greatest(", ", ", ")")
    val cases = (0 until k - 1).map(c =>
      s"WHEN s$c = mx THEN '${m.labels(c)}'").mkString(" ")
    val expSum = (0 until k).map(c =>
      s"exp(CAST(s$c - mx AS DOUBLE) / 1000000.0)").mkString(" + ")
    s"""WITH RECURSIVE
       |toks AS (SELECT id, unnest(CASE WHEN length(t) < $n THEN [t]
       |    ELSE list_transform(generate_series(1, length(t) - ${n - 1}),
       |                        i -> substr(t, i, $n)) END) AS token
       |  FROM (SELECT $idCol AS id, trim(lower($textCol)) AS t FROM $table)),
       |${tfSlotCtes(m.slots)},
       |w AS (SELECT unnest(generate_series(0, ${m.slots - 1})) AS slot,
       |             $wCols),
       |dt AS (SELECT t.id, $dCols
       |       FROM toks t JOIN sl USING (token) JOIN w USING (slot)
       |       GROUP BY t.id),
       |sc AS (SELECT d.$idCol AS id,
       |       $sCols
       |       FROM $table d LEFT JOIN dt ON d.$idCol = dt.id),
       |mxd AS (SELECT *, $best AS mx FROM sc)
       |SELECT id AS $idCol,
       |  CASE $cases ELSE '${m.labels(k - 1)}' END AS lang_pred,
       |  round(1.0 / ($expSum), $dp) AS lang_prob
       |FROM mxd""".stripMargin
  }
}
