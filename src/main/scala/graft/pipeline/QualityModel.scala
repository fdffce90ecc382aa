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
    // empty-token filter mirrors applyHashedModel's `length > 0` guard —
    // the featurizations must stay bit-identical
    val toks = labeled.select(col(labelCol).cast("double").as("label"),
      filter(TextAnalysis.tokens(col(textCol)),
        t => length(t) > 0).as("toks"))
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("toks").setOutputCol("features").setNumFeatures(slots)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
    val model = lr.fit(tf.transform(toks))
    HashedModel(model.coefficients.toArray, model.intercept, slots)
  }

  /** Score a corpus with a fitted model, MLlib-free: slot =
    * `tf_slot(token, slots)` (the codegen HashingTF featurization — see
    * the object doc), per-slot term counts, dot product against the
    * broadcast weight literal, sigmoid last. Emits (id, quality_prob).
    * One token hash-agg + one id hash-agg, both map-side combined; the
    * weights travel as a `slots`-double literal in the plan, exactly
    * like the IVF centroid arrays. */
  def applyHashedModel(df: DataFrame, textCol: String, idCol: String,
                       m: HashedModel): DataFrame = {
    require(m.weights.length == m.slots,
      s"model has ${m.weights.length} weights for ${m.slots} slots")
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .where(length(col("token")) > 0)
      .select(col(idCol),
        graft.fuzzy.vectorFunctions.tf_slot(col("token"), m.slots).as("__slot"))
      .groupBy(col(idCol), col("__slot")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__w", element_at(lit(m.weights), col("__slot").cast("int") + 1))
      .groupBy(col(idCol))
      .agg(sum(col("__w") * col("__cnt")).as("__dot"))
      .select(col(idCol),
        (lit(1.0) / (lit(1.0) + exp(-(col("__dot") + lit(m.intercept)))))
          .as("quality_prob"))
  }
}
