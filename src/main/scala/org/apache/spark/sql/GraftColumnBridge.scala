package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Bridge into Spark's `private[sql]` Expression ⇄ Column converters so the
  * graft library can ship native Catalyst expressions (see
  * `graft.expressions`) while exposing them as ordinary `Column`s.
  *
  * This is the standard extension-library pattern: custom expressions are
  * a sanctioned extension point (`SparkSessionExtensions.injectFunction`),
  * but building a `Column` from an `Expression` directly — needed for the
  * DataFrame-side API — requires this one-file bridge in the
  * `org.apache.spark.sql` package.
  */
object GraftColumnBridge {

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Spark's standard NON_FOLDABLE_ARGUMENT AnalysisException, for SQL
    * builders whose shape parameters (signature width, band count) must
    * be literals. */
  def nonFoldableArgument(funcName: String, param: String,
      dt: org.apache.spark.sql.types.DataType): Throwable =
    errors.QueryCompilationErrors.nonFoldableArgumentError(funcName, param, dt)

  /** Register a function builder on an already-running session (the
    * programmatic twin of `spark.sql.extensions=graft.GraftExtensions`,
    * for sessions the library does not construct itself). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info,
        (children: Seq[Expression]) => builder(children))
}
