package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The exported (quantized) apply path of [[ModelExport]]: integer
  * scoring must track the float model, keep the one-row-per-doc
  * contract, and stay bit-stable — it is what the DuckDB oracle replays
  * (the murmur3 SQL itself is validated by the driver's oracle run; here
  * we pin the Spark side and the quantization error bound). */
class ModelExportSpec extends AnyFunSuite with SparkSpec {

  import spark.implicits._

  test("quantized quality apply tracks the float model within grid error " +
    "and emits one row per doc (empty/null included)") {
    val labeled = ((1 to 40).map(i => (s"good solid prose extra$i", 1.0)) ++
      (1 to 40).map(i => (s"!!! $$$$ junk$i", 0.0))).toDF("text", "label")
    val m = QualityModel.fitHashedClassifier(labeled, "text", "label",
      slots = 128, maxIter = 30)
    val qm = ModelExport.quantize(m)
    assert(qm.slots == 128 && qm.weightsMicro.length == 128)

    val docs = Seq((1L, "good solid prose"), (2L, "!!! junk1"),
      (3L, ""), (4L, "   "), (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val q = ModelExport.applyQuantized(docs, "text", "doc_id", qm)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.keySet == Set(1L, 2L, 3L, 4L, 5L))
    val f = QualityModel.applyHashedModel(docs, "text", "doc_id", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 1e-6 grid on <=3-token dots + intercept: probability moves < 1e-5
    q.foreach { case (id, p) => assert(math.abs(p - f(id)) < 1e-5,
      s"doc $id: quantized $p vs float ${f(id)}") }
    // zero-token docs = sigmoid(interceptMicro/1e6), all three alike
    assert(q(3L) == q(4L) && q(4L) == q(5L))
    val icpt = 1.0 / (1.0 + math.exp(-qm.interceptMicro / 1e6))
    assert(math.abs(q(3L) - icpt) < 1e-12)
  }

  test("quantized langid apply: integer argmax matches the float model's " +
    "prediction on separable data; ties break to the smaller label; " +
    "empty/null docs fall to the intercept argmax") {
    val rnd = new scala.util.Random(11)
    def doc(alpha: String): String =
      Seq.fill(10)(Seq.fill(4)(alpha(rnd.nextInt(alpha.length))).mkString)
        .mkString(" ")
    val rows = (0 until 60).map { i =>
      val lang = Seq("aa", "bb", "cc")(i % 3)
      val alpha = Map("aa" -> "aeiou", "bb" -> "kptrs", "cc" -> "xwzvq")(lang)
      (i.toLong, doc(alpha), lang)
    }
    val m = QualityModel.fitLangId(rows.toDF("doc_id", "text", "lang"),
      "text", "lang", slots = 128, ngramLen = 3, maxIter = 30)
    val qm = ModelExport.quantize(m)

    val preds = ModelExport.applyLangIdQuantized(
      rows.toDF("doc_id", "text", "lang"), "text", "doc_id", qm)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(2))).toMap
    rows.foreach { case (id, _, lang) =>
      assert(preds(id)._1 == lang, s"doc $id: ${preds(id)} vs $lang")
      assert(preds(id)._2 > 1.0 / 3 && preds(id)._2 <= 1.0)
    }

    val edge = ModelExport.applyLangIdQuantized(
      Seq((90L, ""), (91L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"), "text", "doc_id", qm)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(edge.keySet == Set(90L, 91L))
    // null text = pure intercept argmax (exact integers)
    val icptArg = qm.labels(qm.interceptsMicro.zipWithIndex.maxBy {
      case (v, i) => (v, -i) }._2)
    assert(edge(91L)._1 == icptArg && !edge(91L)._2.isNaN)
    assert(!edge(90L)._2.isNaN)
  }

  test("stored quantized models round-trip exactly through parquet and " +
    "apply bit-identically") {
    val dir = java.nio.file.Files.createTempDirectory("qmodel").toString
    ModelExport.save(DemoModels.Quality, s"$dir/q", spark)
    val q = ModelExport.loadLinear(spark, s"$dir/q")
    assert(q.weightsMicro.sameElements(DemoModels.Quality.weightsMicro) &&
      q.interceptMicro == DemoModels.Quality.interceptMicro &&
      q.slots == DemoModels.Quality.slots)
    ModelExport.save(DemoModels.LangId, s"$dir/l", spark)
    val l = ModelExport.loadLangId(spark, s"$dir/l")
    assert(l.labels.sameElements(DemoModels.LangId.labels) &&
      l.slots == DemoModels.LangId.slots && l.ngramLen == DemoModels.LangId.ngramLen &&
      l.interceptsMicro.sameElements(DemoModels.LangId.interceptsMicro) &&
      (l.weightsMicro, DemoModels.LangId.weightsMicro).zipped.forall(_.sameElements(_)))

    val docs = Seq((1L, "good committee text"), (2L, "!!! $$$")).toDF("doc_id", "text")
    val a = ModelExport.applyQuantized(docs, "text", "doc_id", DemoModels.Quality)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val b = ModelExport.applyQuantized(docs, "text", "doc_id", q)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(a == b, "loaded model must score bit-identically")
  }

  test("demo models are well-formed and the oracle SQL embeds their " +
    "exact constants") {
    val q = DemoModels.Quality
    val l = DemoModels.LangId
    assert(q.slots == 128 && l.slots == 128 && l.ngramLen == 3)
    assert(l.labels.toSeq == Seq("de", "en", "es", "fr", "it"))
    val qSql = ModelExport.qualityApplyOracleSql("documents", "text", "doc_id", q)
    assert(qSql.contains(q.interceptMicro.toString) &&
      qSql.contains(q.weightsMicro.take(3).mkString("[", ", ", "")))
    val lSql = ModelExport.langIdApplyOracleSql("documents", "text", "doc_id", l)
    l.labels.foreach(lab => assert(lSql.contains(s"'$lab'")))
    assert(lSql.contains(l.interceptsMicro(0).toString))
    // the murmur replay is present for both (seed 42 + fmix constants)
    Seq(qSql, lSql).foreach { s =>
      assert(s.contains("CAST(42 AS BIGINT)") && s.contains("2246822507") &&
        s.contains("3266489909") && s.contains("3432918353"))
    }
  }
}
