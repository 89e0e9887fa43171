package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the private[sql] surface Spark 4 hides: wrapping a
  * Catalyst Expression as a Column and registering expression builders.
  * Standard extension-library escape hatch (Delta/Sedona et al. do the
  * same); everything else in this repo stays on the public API. */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def registerFn(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
