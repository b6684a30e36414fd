package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Narrow bridge to session-internal registries.
  *
  * Spark's public runtime API (`spark.udf.register`) only accepts
  * black-box Scala functions, which break whole-stage codegen and hide
  * expressions from Catalyst. To register native `Expression` builders
  * (foldable, codegen'd, optimizer-visible) on an already-running session
  * we need `sessionState.functionRegistry`, which is `private[sql]` —
  * hence this accessor living under `org.apache.spark.sql`.
  */
object Internals {
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  def functionExists(spark: SparkSession, name: String): Boolean =
    spark.asInstanceOf[ClassicSession].sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name))

  /** Wrap a raw Catalyst Expression as a user-facing Column (Spark 4 has
    * no public constructor for this). */
  def column(e: Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  /** Apply a SparkSessionExtensions' injected functions to a scratch
    * registry and list them (test support — `registerFunctions` is
    * private[sql]). */
  def injectedFunctionNames(
      ext: org.apache.spark.sql.SparkSessionExtensions): Seq[String] = {
    val reg = new org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }
}
