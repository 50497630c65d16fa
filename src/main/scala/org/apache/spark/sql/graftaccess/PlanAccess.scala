package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridges for the private[sql] plan plumbing a custom operator needs:
  * analyzed child plans, attribute resolution by name, and
  * Dataset.ofRows to lift a custom LogicalPlan back into a DataFrame. */
object PlanAccess {
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  def attr(df: DataFrame, name: String): Attribute =
    analyzed(df).output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$name' in [${analyzed(df).output.map(_.name).mkString(", ")}]"))

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
