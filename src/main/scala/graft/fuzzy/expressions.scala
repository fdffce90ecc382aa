package graft.fuzzy

import org.apache.spark.sql.{Column, GraftSql, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Normalized string distance as a native Catalyst expression.
  *
  * The reference's hot loop is a vectorized Rust kernel over a candidate
  * table (process.py:46-50). The Spark-idiomatic analog is a codegen'd
  * expression so the cross-join -> score -> filter pipeline stays inside one
  * WholeStageCodegen stage and the cartesian product is never materialized.
  */
case class FuzzyDistance(left: Expression, right: Expression, algo: FuzzyAlgorithm)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) arguments, " +
          s"got (${left.dataType.catalogString}, ${right.dataType.catalogString})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = s"${algo.name}_dist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dist(algo.id, a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.fuzzy.Kernels.dist(${algo.id}, $a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Thresholded variant used on the scoring hot path: returns the exact
  * normalized distance when it is <= maxDist, and 2.0 otherwise — which is
  * indistinguishable from [[FuzzyDistance]] under the matcher's
  * `dist <= threshold` filter, but prunes with length bounds and a banded
  * DP (Kernels.distBounded). */
case class BoundedFuzzyDistance(left: Expression, right: Expression,
                                algo: FuzzyAlgorithm, maxDist: Double)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string) arguments")

  override def dataType: DataType = DoubleType
  override def prettyName: String = s"${algo.name}_dist_bounded"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.distBounded(algo.id, a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], maxDist)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.fuzzy.Kernels.distBounded(${algo.id}, $a, $b, $maxDist)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level API for the six kernels + SQL registration. */
object functions {

  /** Normalized distance in [0,1] (0 = identical). */
  def fuzzy_dist(left: Column, right: Column, algo: FuzzyAlgorithm): Column =
    GraftSql.column(FuzzyDistance(GraftSql.expression(left), GraftSql.expression(right), algo))

  /** Similarity in [0,1] (1 = identical) = 1 - distance. */
  def fuzzy_sim(left: Column, right: Column, algo: FuzzyAlgorithm): Column =
    org.apache.spark.sql.functions.lit(1.0) - fuzzy_dist(left, right, algo)

  /** Thresholded distance for `<= maxDist` filters (see [[BoundedFuzzyDistance]]). */
  def fuzzy_dist_bounded(left: Column, right: Column, algo: FuzzyAlgorithm, maxDist: Double): Column =
    GraftSql.column(BoundedFuzzyDistance(GraftSql.expression(left), GraftSql.expression(right), algo, maxDist))

  def levenshtein_dist(l: Column, r: Column): Column = fuzzy_dist(l, r, FuzzyAlgorithm.Levenshtein)
  def jaro_dist(l: Column, r: Column): Column = fuzzy_dist(l, r, FuzzyAlgorithm.Jaro)
  def jaro_winkler_dist(l: Column, r: Column): Column = fuzzy_dist(l, r, FuzzyAlgorithm.JaroWinkler)
  def hamming_dist(l: Column, r: Column): Column = fuzzy_dist(l, r, FuzzyAlgorithm.Hamming)
  def damerau_levenshtein_dist(l: Column, r: Column): Column = fuzzy_dist(l, r, FuzzyAlgorithm.DamerauLevenshtein)
  def indel_dist(l: Column, r: Column): Column = fuzzy_dist(l, r, FuzzyAlgorithm.Indel)

  /** `(name, builder)` pairs for the SQL surface — consumed by
    * [[registerAll]] (temp functions on an existing session) and by
    * [[graft.GraftExtensions]] (session-build-time injection). */
  private[graft] def sqlBuilders: Seq[(String, Seq[Expression] => Expression)] =
    FuzzyAlgorithm.all.flatMap { algo =>
      Seq[(String, Seq[Expression] => Expression)](
        s"${algo.name}_dist" ->
          (exprs => FuzzyDistance(exprs(0), exprs(1), algo)),
        s"${algo.name}_sim" ->
          (exprs => org.apache.spark.sql.catalyst.expressions.Subtract(
            org.apache.spark.sql.catalyst.expressions.Literal(1.0),
            FuzzyDistance(exprs(0), exprs(1), algo))))
    }

  /** Register `<algo>_dist` + `<algo>_sim` for every algorithm so fuzzy
    * predicates are usable from `spark.sql(...)`. */
  def registerAll(spark: SparkSession): Unit =
    sqlBuilders.foreach { case (name, builder) =>
      GraftSql.registerFunction(spark, name, builder)
    }
}
