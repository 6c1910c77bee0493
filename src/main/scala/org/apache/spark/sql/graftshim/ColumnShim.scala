package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * standard shim pattern Spark extension libraries use to register
  * custom Catalyst expressions as Columns (the public API in Spark 4
  * goes through ColumnNode, whose classic converter lives behind
  * `private[sql]`).
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a `SparkSessionExtensions`' injected functions to a
    * registry (`registerFunctions` is `private[sql]`) — lets tests
    * exercise the extension path without building a new SparkSession
    * (a shared-session test JVM can't re-run session construction).
    */
  def applyFunctionExtensions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)

  /** The LIVE session's function registry (`sessionState` is
    * `private[sql]`) — lets an already-built session install the
    * extension functions after the fact (the `spark.sql.extensions`
    * config only applies at session construction).
    */
  def sessionFunctionRegistry(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
}
