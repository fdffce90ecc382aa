package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The FIT half of the fastText-shaped quality-classifier pipeline
  * ([[TextAnalysis.hashedLinearScore]] is the fixed-weight stand-in):
  * train a logistic regression over hashed token-count features on a
  * LABELED SEED SET (thousands of rows — quality labels are expensive),
  * then score the full corpus with a pure codegen plan that carries the
  * learned weights as a literal array — no MLlib, no UDF, no model
  * object anywhere near the 100 TB scan.
  *
  * The seam that makes this safe: [[graft.fuzzy.VectorKernels.tfSlot]]
  * reproduces `ml.feature.HashingTF.indexOf` bit-for-bit
  * (murmur3_x86_32 `hashUnsafeBytes2`, seed 42, non-negative mod — note
  * the SQL `hash()` function does NOT match: it keeps the pre-3.0 hash
  * variant), spec-asserted term by term. A drift between fit-time and
  * apply-time featurization is the classic silent killer of deployed
  * text classifiers.
  *
  * No DuckDB oracle (L-BFGS is not SQL-expressible): the fit is
  * spec-gated (separable corpus, probability parity between the MLlib
  * model and the SQL apply), and the apply-side query gets the driver's
  * rows-only check.
  */
object QualityModel {

  /** Learned weights in slot order + intercept; `slots` pins the hash
    * space so apply cannot silently mismatch the fit. */
  final case class HashedModel(weights: Array[Double], intercept: Double,
                               slots: Int)

  /** Fit on (textCol, labelCol ∈ {0,1}): whitespace tokens → HashingTF
    * term counts (`slots` features) → binomial logistic regression.
    * Runs wherever the seed set lives; cost is per-iteration treeAggregate
    * over the SEED rows only. */
  def fitHashedClassifier(labeled: DataFrame, textCol: String,
                          labelCol: String, slots: Int = 1024,
                          maxIter: Int = 50,
                          regParam: Double = 0.01): HashedModel = {
    require(slots > 0, s"slots must be positive (got $slots)")
    // null-text/label seed rows are dropped (HashingTF NPEs on a null
    // token array deep inside MLlib); empty-token filter mirrors
    // applyHashedModel — the featurizations must stay bit-identical
    val toks = labeled
      .where(col(labelCol).isNotNull && col(textCol).isNotNull)
      .select(col(labelCol).cast("double").as("label"),
        filter(TextAnalysis.tokens(col(textCol)),
          t => length(t) > 0).as("toks"))
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("toks").setOutputCol("features").setNumFeatures(slots)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
    val model = lr.fit(tf.transform(toks))
    HashedModel(model.coefficients.toArray, model.intercept, slots)
  }

  /** Learned MULTICLASS language-id (the fastText shape proper:
    * multinomial logistic regression over hashed character-n-gram
    * counts), same fit-on-MLlib / apply-in-codegen seam as
    * [[HashedModel]]. `labels` is sorted, and class index order is
    * pinned to it on both sides. */
  final case class LangIdModel(weights: Array[Array[Double]],
                               intercepts: Array[Double],
                               labels: Array[String],
                               slots: Int, ngramLen: Int) {
    require(weights.length == labels.length &&
      intercepts.length == labels.length &&
      weights.forall(_.length == slots),
      "LangIdModel shape mismatch")
  }

  /** Fit on (textCol, langCol): char n-grams of the lowercased trimmed
    * text → HashingTF counts → multinomial LR. The featurization column
    * is graft's own `char_ngrams` kernel so fit and apply consume the
    * IDENTICAL n-gram stream (the same drift-proof seam as the binary
    * classifier; tf_slot ↔ HashingTF parity is spec-pinned). */
  def fitLangId(labeled: DataFrame, textCol: String, langCol: String,
                slots: Int = 2048, ngramLen: Int = 3, maxIter: Int = 50,
                regParam: Double = 0.01): LangIdModel = {
    require(slots > 0 && ngramLen > 0, "slots and ngramLen must be positive")
    // null-TEXT seed rows are dropped along with null-lang ones
    // (char_ngrams(null) is null and HashingTF would NPE on it deep
    // inside MLlib) — and `labels` MUST come from this same filtered
    // frame: a language whose every seed row has null text would
    // otherwise stay in `labels` with zero training rows, making MLlib's
    // inferred class count smaller than labels.length and misaligning
    // the coefficientMatrix copy below
    val seed = labeled.where(col(langCol).isNotNull && col(textCol).isNotNull)
    val labels = seed.select(col(langCol))
      .distinct().collect().map(_.getString(0)).sorted
    require(labels.length >= 2, s"need >= 2 languages (got ${labels.toSeq})")
    val labelIx = labels.tail.zipWithIndex.foldLeft(
      when(col(langCol) === labels.head, 0.0)) { case (acc, (l, i)) =>
      acc.when(col(langCol) === l, (i + 1).toDouble)
    }
    val feats = seed
      .select(labelIx.as("label"),
        graft.fuzzy.vectorFunctions.char_ngrams(
          lower(trim(col(textCol))), ngramLen).as("toks"))
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("toks").setOutputCol("features").setNumFeatures(slots)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFamily("multinomial").setMaxIter(maxIter).setRegParam(regParam)
    val model = lr.fit(tf.transform(feats))
    require(model.numClasses == labels.length,
      s"MLlib inferred ${model.numClasses} classes for ${labels.length} " +
        "labels — seed frame and label set diverged")
    val cm = model.coefficientMatrix // numClasses x slots
    val w = Array.tabulate(labels.length)(c =>
      Array.tabulate(slots)(s => cm(c, s)))
    LangIdModel(w, model.interceptVector.toArray, labels, slots, ngramLen)
  }

  /** Classify a corpus with a fitted [[LangIdModel]], MLlib-free: one
    * n-gram explode → tf_slot → per-(doc, slot) counts, then k linear
    * scores in ONE aggregate (each class's weight vector rides as a
    * literal) and a softmax/argmax projection. Ties break toward the
    * lexicographically-smaller language. Emits
    * (idCol, lang_pred, lang_prob — softmax of the winning class, FULL
    * precision; round at the consumer). Empty text hashes its single
    * empty n-gram — the char_ngrams short-string collapse — identically
    * at fit and apply time; NULL text rides `explode_outer` to a
    * null-token row whose per-class sums null out and fall to the
    * all-intercepts prediction. Either way the output is never null,
    * and the corpus is scanned exactly once. */
  def applyLangId(df: DataFrame, textCol: String, idCol: String,
                  m: LangIdModel): DataFrame = {
    val k = m.labels.length
    // explode_outer: a null-text doc keeps one null-token row, whose
    // per-class sums come out null and fall to the intercepts below —
    // the no-token fallback WITHOUT a second corpus scan + join (the
    // module doc's one-scan contract)
    val dots = df
      .select(col(idCol), explode_outer(graft.fuzzy.vectorFunctions.char_ngrams(
        lower(trim(col(textCol))), m.ngramLen)).as("token"))
      .select(col(idCol),
        graft.fuzzy.vectorFunctions.tf_slot(col("token"), m.slots).as("__slot"))
      .groupBy(col(idCol), col("__slot")).agg(count(lit(1)).as("__cnt"))
      .groupBy(col(idCol))
      .agg(
        sum(element_at(lit(m.weights(0)), col("__slot").cast("int") + 1)
          * col("__cnt")).as("__d0"),
        (1 until k).map(c =>
          sum(element_at(lit(m.weights(c)), col("__slot").cast("int") + 1)
            * col("__cnt")).as(s"__d$c")): _*)
    val scored = dots
      .select(col(idCol) +: (0 until k).map(c =>
        (coalesce(col(s"__d$c"), lit(0.0)) + lit(m.intercepts(c))).as(s"__s$c")): _*)
    val maxScore = greatest((0 until k).map(c => col(s"__s$c")): _*)
    // stable argmax: the FIRST class attaining the max wins, and labels
    // are sorted, so ties go to the lexicographically-smaller language
    val predIx = (k - 1 to 0 by -1).foldLeft(lit(-1)) { case (acc, c) =>
      when(col(s"__s$c") === maxScore, c).otherwise(acc)
    }
    val expSum = (0 until k).map(c => exp(col(s"__s$c") - maxScore)).reduce(_ + _)
    // full precision like applyHashedModel — callers/entries round
    scored.select(col(idCol),
      element_at(lit(m.labels), predIx + 1).as("lang_pred"),
      (lit(1.0) / expSum).as("lang_prob"))
  }

  /** Score a corpus with a fitted model, MLlib-free: slot =
    * `tf_slot(token, slots)` (the codegen HashingTF featurization — see
    * the object doc), per-slot term counts, dot product against the
    * broadcast weight literal, sigmoid last. Emits (id, quality_prob).
    * One token hash-agg + one id hash-agg, both map-side combined; the
    * weights travel as a `slots`-double literal in the plan, exactly
    * like the IVF centroid arrays.
    *
    * One row per input document, ALWAYS: a doc with no non-empty tokens
    * (empty, whitespace-only, or NULL text) rides `explode_outer` to a
    * single null-token row whose dot product nulls out and coalesces to
    * 0.0 — it scores `sigmoid(intercept)`, exactly what the fitted model
    * assigns a zero feature vector. Same contract (and same one-scan
    * mechanism) as [[applyLangId]]; silently omitting those rows would
    * change downstream join cardinalities on a crawl corpus. */
  def applyHashedModel(df: DataFrame, textCol: String, idCol: String,
                       m: HashedModel): DataFrame = {
    require(m.weights.length == m.slots,
      s"model has ${m.weights.length} weights for ${m.slots} slots")
    // element-wise empty-token filter BEFORE the explode (bit-identical
    // to the fit's featurization); explode_outer keeps empty arrays as
    // one null-token row instead of dropping the doc
    df.select(col(idCol), explode_outer(
        filter(TextAnalysis.tokens(col(textCol)), t => length(t) > 0)).as("token"))
      .select(col(idCol),
        graft.fuzzy.vectorFunctions.tf_slot(col("token"), m.slots).as("__slot"))
      .groupBy(col(idCol), col("__slot")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__w", element_at(lit(m.weights), col("__slot").cast("int") + 1))
      .groupBy(col(idCol))
      .agg(sum(col("__w") * col("__cnt")).as("__dot"))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) +
          exp(-(coalesce(col("__dot"), lit(0.0)) + lit(m.intercept)))))
          .as("quality_prob"))
  }
}
