package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge to the private[sql] readback side of SparkSessionExtensions so
  * a spec can assert what an extensions class ACTUALLY injects without
  * building a second SparkSession (one JVM-wide context in tests). */
object ExtensionsAccess {
  def plannerStrategies(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  /** Names the extensions class registers into a fresh function registry. */
  def registeredFunctionNames(ext: SparkSessionExtensions): Seq[String] = {
    val reg = new SimpleFunctionRegistry
    ext.registerFunctions(reg)
    reg.listFunction().map(_.funcName)
  }
}
