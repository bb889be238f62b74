package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so that
  * graft's custom Catalyst expressions can be exposed as user-facing
  * `Column`s (Spark 4 removed the public `new Column(expr)` constructor).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The analyzer's own WRONG_NUM_ARGS AnalysisException (the constructor
    * and QueryCompilationErrors are `private[sql]`), for injected SQL
    * function builders to validate arity instead of dying on `es(1)` with
    * a bare IndexOutOfBoundsException at plan time.
    */
  def wrongNumArgs(name: String, expected: Int, actual: Int): Throwable =
    org.apache.spark.sql.errors.QueryCompilationErrors
      .wrongNumArgsError(name, Seq(expected), actual)
}
