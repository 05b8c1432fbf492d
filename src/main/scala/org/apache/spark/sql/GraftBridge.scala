package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's `private[sql]` Column↔Expression
  * conversions (org.apache.spark.sql.classic.ExpressionUtils, Spark
  * 4.x). Lives in the org.apache.spark.sql package solely to satisfy
  * the access modifier — the standard pattern for libraries that add
  * native Catalyst expressions. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a Catalyst expression builder as a session-scoped SQL
    * function (usable from spark.sql). */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
