package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge to Spark's `private[sql]` Expression↔Column converters —
  * the standard pattern for extension libraries shipping native Catalyst
  * expressions (the only supported alternatives are SQL-registry
  * round-trips). Keep this object minimal: the engine's own code all
  * lives under `graft.*`. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' function injections to an existing
    * registry (the hook a new session would call at build time is
    * `private[sql]`) — lets tests exercise the real injection path on a
    * shared session instead of juggling getOrCreate reuse. */
  def registerInjectedFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)

  /** The table-function twin of [[registerInjectedFunctions]] — applies
    * a SparkSessionExtensions' TABLE-function injections to an existing
    * registry, for the same test-on-a-shared-session reason. */
  def registerInjectedTableFunctions(
      ext: org.apache.spark.sql.SparkSessionExtensions,
      registry: org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.TableFunctionRegistry =
    ext.registerTableFunctions(registry)
}
