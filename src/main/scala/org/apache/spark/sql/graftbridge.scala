package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * supported way for libraries to lift custom Catalyst expressions
  * (e.g. graft.functions.DotProductFloat) into the public Column API
  * on Spark 4, where `Column.expr`/`new Column(expr)` are gone.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' injected functions to an existing
    * session's registry (testing hook; production uses
    * `spark.sql.extensions` at session build time).
    */
  def applyFunctionExtensions(ext: SparkSessionExtensions,
      spark: SparkSession): Unit =
    ext.registerFunctions(spark.sessionState.functionRegistry)
}
