package graft.tools

import org.apache.spark.unsafe.types.UTF8String

/** Dev-only probe: prints `term<TAB>tf_slot(term, slots)` for a fixed
  * term list, as ground truth for validating the DuckDB murmur3 replay
  * in [[graft.pipeline.ModelExport]]. Not part of the library surface. */
object TfSlotProbe {
  def main(args: Array[String]): Unit = {
    val slots = if (args.nonEmpty) args(0).toInt else 128
    val terms = Seq("", "a", "ab", "abc", "abcd", "abcde", "abcdef",
      "the", "quick", "brown", "fox", "committee", "x1", "überraschung",
      "日本語", "résumé", "naïve", "pročë", "zzzz9999", "  ", "tab\tx",
      "0", "00", "000", "0000", "00000", "ñ", "ß", "€uro")
    terms.foreach { t =>
      val slot = graft.fuzzy.VectorKernels.tfSlot(UTF8String.fromString(t), slots)
      println(s"${java.util.Base64.getEncoder.encodeToString(t.getBytes("UTF-8"))}\t$slot")
    }
  }
}
