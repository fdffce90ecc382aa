package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Fit/apply seam of the learned quality classifier ([[QualityModel]]):
  * the SQL apply must reproduce the MLlib featurization and probabilities
  * exactly, or the deployed scorer silently diverges from the model that
  * was validated.
  */
class QualityModelSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("tf_slot equals HashingTF's indexing, term by term") {
    val terms = Seq("the", "quick", "brown", "fox", "überraschung", "日本語",
      "x", "", "a b", "123", "&amp;")
    val slots = 1024
    val tf = new org.apache.spark.ml.feature.HashingTF().setNumFeatures(slots)
    val expected = terms.map(t => tf.indexOf(t))
    val got = terms.toDF("t")
      .select(graft.fuzzy.vectorFunctions.tf_slot(col("t"), slots))
      .as[Int].collect().toSeq
    assert(got == expected,
      s"tf_slot diverged from HashingTF: $got vs $expected")
    // and the SQL hash() function does NOT match (pre-3.0 hash variant) —
    // the divergence that makes tf_slot necessary; they agree only on ""
    val sqlHash = terms.toDF("t")
      .select(pmod(hash(col("t")), lit(slots)).cast("int")).as[Int].collect().toSeq
    assert(sqlHash != expected, "SQL hash() unexpectedly matches HashingTF " +
      "— tf_slot may be redundant now")
  }

  test("tf_slot matches HashingTF on 500 seeded-random unicode terms") {
    val rnd = new scala.util.Random(7)
    val terms = (1 to 500).map(_ => rnd.nextString(rnd.nextInt(12)))
    val tf = new org.apache.spark.ml.feature.HashingTF().setNumFeatures(4096)
    val expected = terms.map(t => tf.indexOf(t))
    val got = terms.toDF("t")
      .select(graft.fuzzy.vectorFunctions.tf_slot(col("t"), 4096))
      .as[Int].collect().toSeq
    assert(got == expected)
  }

  test("multiclass langid: fit separates three character distributions; " +
    "apply matches MLlib's winning probability; empty text never nulls") {
    val rnd = new scala.util.Random(5)
    def doc(alpha: String): String =
      Seq.fill(12)(Seq.fill(3 + rnd.nextInt(4))(alpha(rnd.nextInt(alpha.length)))
        .mkString).mkString(" ")
    val rows = (0 until 90).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val alpha = Map("aa" -> "aeiou", "bb" -> "kptrs", "cc" -> "xwzvq")(lang)
      (i.toLong, doc(alpha), lang)
    }
    val df = rows.toDF("doc_id", "text", "lang")
    val m = QualityModel.fitLangId(df, "text", "lang", slots = 512, ngramLen = 3)
    assert(m.labels.toSeq == Seq("aa", "bb", "cc"))

    val pred = QualityModel.applyLangId(df, "text", "doc_id", m)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("lang_pred"), r.getAs[Double]("lang_prob"))).toMap
    val truth = rows.map(r => r._1 -> r._3).toMap
    val acc = rows.count(r => pred(r._1)._1 == truth(r._1)).toDouble / rows.size
    assert(acc == 1.0, s"accuracy $acc")

    // probability parity with MLlib's own multinomial transform
    val feats = df.select(col("doc_id"),
      graft.fuzzy.vectorFunctions.char_ngrams(lower(trim(col("text"))), 3).as("toks"))
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("toks").setOutputCol("features").setNumFeatures(512)
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setFamily("multinomial").setMaxIter(50).setRegParam(0.01)
    val labelIx = when(col("lang") === "aa", 0.0)
      .when(col("lang") === "bb", 1.0).otherwise(2.0)
    val mllib = lr.fit(tf.transform(
      df.select(labelIx.as("label"),
        graft.fuzzy.vectorFunctions.char_ngrams(lower(trim(col("text"))), 3).as("toks"))))
    val probs = mllib.transform(tf.transform(feats))
      .select(col("doc_id"), col("probability")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[org.apache.spark.ml.linalg.Vector](1).toArray.max).toMap
    rows.foreach { r =>
      assert(math.abs(pred(r._1)._2 - probs(r._1)) < 1e-6,
        s"doc ${r._1}: ${pred(r._1)._2} vs ${probs(r._1)}")
    }

    // empty AND null text: one-scan fallback, never null output
    val edge = QualityModel.applyLangId(
      Seq((99L, ""), (100L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "text", "doc_id", m)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!edge(99L).isNullAt(1) && !edge(99L).getAs[Double]("lang_prob").isNaN)
    assert(!edge(100L).isNullAt(1) && !edge(100L).getAs[Double]("lang_prob").isNaN)
    // null-text seed rows are dropped by the fit, not NPE'd in MLlib —
    // and a language whose EVERY seed row has null text drops out of
    // `labels` entirely (it has zero training rows; keeping it would
    // misalign MLlib's class count with the label array)
    val mNull = QualityModel.fitLangId(
      (rows :+ ((990L, null.asInstanceOf[String], "aa"))
        :+ ((991L, null.asInstanceOf[String], "zz"))
        :+ ((992L, null.asInstanceOf[String], "zz")))
        .toDF("doc_id", "text", "lang"),
      "text", "lang", slots = 512, ngramLen = 3, maxIter = 5)
    assert(mNull.labels.toSeq == Seq("aa", "bb", "cc"))
  }

  test("fit separates a labeled corpus; SQL apply matches MLlib probabilities") {
    val spamWords = "buy cheap pills now click here winner prize"
    val hamWords = "the committee reviewed quarterly results and approved the plan"
    val labeled = ((1 to 40).map(i => (s"$spamWords extra$i", 0.0)) ++
      (1 to 40).map(i => (s"$hamWords extra$i", 1.0))).toDF("text", "label")
    val m = QualityModel.fitHashedClassifier(labeled, "text", "label",
      slots = 256, maxIter = 30, regParam = 0.001)
    assert(m.weights.length == 256)

    val test = Seq(
      (1L, "buy cheap pills click prize"),
      (2L, "committee reviewed the plan and approved results"),
      (3L, s"$spamWords unseen99"),
      (4L, s"$hamWords unseen99")).toDF("doc_id", "text")
    val probs = QualityModel.applyHashedModel(test, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(probs(1L) < 0.2 && probs(3L) < 0.2, s"spam not low: $probs")
    assert(probs(2L) > 0.8 && probs(4L) > 0.8, s"ham not high: $probs")

    // probability parity with an independent driver-side evaluation of
    // the fitted weights under HashingTF's own indexing
    val tf = new org.apache.spark.ml.feature.HashingTF().setNumFeatures(256)
    def refProb(text: String): Double = {
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val dot = toks.groupBy(t => tf.indexOf(t))
        .map { case (s, ts) => m.weights(s) * ts.length }.sum
      1.0 / (1.0 + math.exp(-(dot + m.intercept)))
    }
    val texts = test.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    probs.foreach { case (id, p) =>
      assert(math.abs(p - refProb(texts(id))) < 1e-9,
        s"doc $id: SQL apply $p vs reference ${refProb(texts(id))}")
    }

    // one row per doc, ALWAYS: empty, whitespace-only, and null text all
    // score sigmoid(intercept) — the fitted model's zero-vector output —
    // instead of vanishing from the frame (applyLangId's contract)
    val edge = QualityModel.applyHashedModel(
      Seq((10L, ""), (11L, "   "), (12L, null.asInstanceOf[String]),
        (13L, "committee plan")).toDF("doc_id", "text"),
      "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(edge.keySet == Set(10L, 11L, 12L, 13L),
      s"missing docs: ${edge.keySet}")
    val interceptProb = 1.0 / (1.0 + math.exp(-m.intercept))
    Seq(10L, 11L, 12L).foreach { id =>
      assert(math.abs(edge(id) - interceptProb) < 1e-12,
        s"doc $id: ${edge(id)} vs intercept-only $interceptProb")
    }
    assert(math.abs(edge(13L) - refProb("committee plan")) < 1e-9)

    // null-text seed rows are dropped by the fit, not NPE'd in MLlib
    val mNull = QualityModel.fitHashedClassifier(
      (labeled.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq :+
        ((null.asInstanceOf[String], 1.0))).toDF("text", "label"),
      "text", "label", slots = 256, maxIter = 5)
    assert(mNull.weights.length == 256)
  }
}
