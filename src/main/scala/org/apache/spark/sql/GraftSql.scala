package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into Spark's `private[sql]` Column <-> Expression API.
  *
  * Spark 4 moved `new Column(expr)` behind `org.apache.spark.sql.classic.
  * ExpressionUtils`; custom Catalyst expressions (our similarity kernels)
  * still need to surface as `Column`s. Keeping the bridge in one tiny file
  * confines the `private[sql]` access to a single place.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register an expression builder so the function is callable from SQL and
    * via `functions.call_function`. */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
