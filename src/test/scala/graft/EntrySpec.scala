package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: `SparkEntry.entry` must build and return
  * rows on the sf0.001 fixture. Pinned here so a refactor can't break the
  * flagship path between rounds without a local test catching it.
  */
class EntrySpec extends AnyFunSuite with SparkSpec {

  test("entry() returns matched rows on the smoke fixture") {
    val out = SparkEntry.entry(spark)
    assert(out.count() > 0, "driver smoke-checks rows > 0")
    // flagship shape: both sides' name columns plus the score column
    val cols = out.columns.toSeq
    assert(cols.exists(_.contains("c_name")) && cols.exists(_.contains("s_name")),
      s"unexpected flagship schema: $cols")
  }
}
