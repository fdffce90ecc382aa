package graft.fuzzy

import scala.collection.mutable

/** Output-column naming + right-side rename planning.
  *
  * Behavior-parity with the reference:
  *  - score-column names `{left}_vs_{right}_{algo}` with `_N` dedup counters
  *    (output_column_name_utils.py:4-43);
  *  - right-column `_right`-suffix loop that keeps appending the suffix until
  *    the name collides with neither side nor an earlier rename
  *    (pre_process.py:200-254, incl. the pathological chain cases in
  *    tests/test_pre_process.py:294-305).
  */
object NameUtils {

  def generateOutputColumnName(m: FuzzyMapping): String =
    s"${m.leftCol}_vs_${m.rightCol}_${m.fuzzyType.name}"

  /** Assign final output names: first occurrence keeps the base name, the
    * N-th duplicate gets `_N` (N starts at 1). */
  def setNamesInMappings(maps: Seq[FuzzyMapping]): Seq[FuzzyMapping] = {
    val counter = mutable.Map.empty[String, Int]
    maps.map { m =>
      val base = generateOutputColumnName(m)
      val name = counter.get(base) match {
        case Some(n) =>
          counter(base) = n + 1
          s"${base}_${n + 1}"
        case None =>
          counter(base) = 0
          base
      }
      m.copy(outputColumnName = Some(name))
    }
  }

  /** Compute the rename map for right-side columns that collide with the
    * left side. Only colliding columns appear in the result. */
  def renameRightColumns(leftCols: Seq[String], rightCols: Seq[String],
                         suffix: String = "_right"): Map[String, String] = {
    require(suffix.nonEmpty, "Suffix must not be empty")
    val reserved = mutable.Set.empty[String]
    reserved ++= leftCols
    reserved ++= rightCols
    val leftSet = leftCols.toSet
    val mapping = mutable.LinkedHashMap.empty[String, String]
    rightCols.foreach { col =>
      if (leftSet.contains(col)) {
        var newCol = col
        while (reserved.contains(newCol)) newCol = newCol + suffix
        mapping(col) = newCol
        reserved += newCol
      }
    }
    mapping.toMap
  }

  /** Rewrite mapping right-columns according to a rename map. */
  def renameMappingRightCols(maps: Seq[FuzzyMapping], renames: Map[String, String]): Seq[FuzzyMapping] =
    maps.map(m => renames.get(m.rightCol).fold(m)(n => m.copy(rightCol = n)))
}
