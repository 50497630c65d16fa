package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers a Catalyst expression builder on a live session's function
  * registry (sessionState is private[sql]; same shim technique as
  * ListenerBusAccess). Used when the session was not built with
  * spark.sql.extensions=graft.GraftExtensions. */
object FunctionAccess {
  def register(spark: SparkSession, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", ""),
      builder)
  }
}
