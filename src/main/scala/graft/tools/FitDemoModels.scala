package graft.tools

import org.apache.spark.sql.SparkSession

import graft.pipeline.{ModelExport, QualityModel, TextAnalysis}

/** One-time generator for [[graft.pipeline.DemoModels]]: fits the two
  * learned classifiers on small deterministic synthetic seed corpora,
  * quantizes them onto the 1e-6 grid ([[ModelExport.quantize]]), and
  * prints the Scala source to paste. The pasted constants — not this
  * tool's runtime output — are the library artifact; re-running on a
  * different host may shift low bits of the L-BFGS solution (the
  * quantized GRID values in DemoModels.scala are the pinned truth both
  * the Spark queries and the DuckDB oracles consume).
  *
  * Seed corpora:
  *  - quality: 200 "clean prose" docs (sentences over a fixed word list)
  *    labeled 1 vs 200 junk docs (punctuation runs, shouting, stubs)
  *    labeled 0 — the two classes the published crawl filters separate.
  *  - langid: 80 docs per language for the first five
  *    [[TextAnalysis.langMarkers]] languages (en es fr de it), each doc
  *    a shuffle of that language's marker words plus shared ASCII
  *    filler, so the fitted model keys on real function words.
  */
object FitDemoModels {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val rnd = new scala.util.Random(42)
    val cleanWords = ("the committee reviewed quarterly results and approved " +
      "the plan while engineers shipped reliable storage systems for " +
      "customers across many regions with careful measured progress")
      .split(" ").toSeq
    def cleanDoc(): String =
      Seq.fill(8 + rnd.nextInt(8))(cleanWords(rnd.nextInt(cleanWords.length)))
        .mkString(" ")
    val junkBits = Seq("!!!", "$$$", "CLICK", "HERE", "@@@", "###", "WIN",
      "xx", "???", "zzz", "...", "%%%", "FREE", "NOW!!", "|||")
    def junkDoc(): String =
      Seq.fill(2 + rnd.nextInt(5))(junkBits(rnd.nextInt(junkBits.length)))
        .mkString(" ")
    val quality = ((1 to 200).map(_ => (cleanDoc(), 1.0)) ++
      (1 to 200).map(_ => (junkDoc(), 0.0))).toDF("text", "label")
    val qm = ModelExport.quantize(QualityModel.fitHashedClassifier(
      quality, "text", "label", slots = 128, maxIter = 50, regParam = 0.01))

    val langs = TextAnalysis.langMarkers.take(5) // en es fr de it
    val filler = Seq("data", "2024", "report", "item", "x9", "info")
    val langRows = langs.flatMap { case (lang, markers) =>
      (1 to 80).map { _ =>
        val words = Seq.fill(12)(markers(rnd.nextInt(markers.length))) ++
          Seq.fill(3)(filler(rnd.nextInt(filler.length)))
        (rnd.shuffle(words).mkString(" "), lang)
      }
    }
    val lm = ModelExport.quantize(QualityModel.fitLangId(
      langRows.toDF("text", "lang"), "text", "lang",
      slots = 128, ngramLen = 3, maxIter = 50, regParam = 0.01))

    def longs(a: Array[Long]): String = a.mkString("Array[Long](", "L, ", "L)")
    println("  val Quality: ModelExport.QuantizedLinearModel =")
    println(s"    ModelExport.QuantizedLinearModel(${longs(qm.weightsMicro)},")
    println(s"      ${qm.interceptMicro}L, ${qm.slots})")
    println()
    println("  val LangId: ModelExport.QuantizedLangIdModel =")
    println("    ModelExport.QuantizedLangIdModel(Array(")
    lm.weightsMicro.foreach(w => println(s"      ${longs(w)},"))
    println(s"    ), ${longs(lm.interceptsMicro)},")
    println(s"      Array(${lm.labels.map(l => s""""$l"""").mkString(", ")}), ${lm.slots}, ${lm.ngramLen})")
    spark.stop()
  }
}
