package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Column ↔ catalyst-Expression converters
  * (`classic.ExpressionUtils`) `private[sql]`, so a library shipping
  * native Catalyst expressions needs this one-file bridge living under
  * the `org.apache.spark.sql` namespace — the same approach other
  * Spark-native OSS libraries take. No Spark behavior is altered. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The session's function registry (`sessionState` is `private[sql]`
    * too) — lets tests exercise `GraftExtensions.register` against an
    * already-built session, where `withExtensions` can no longer run. */
  def registry(s: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
}
