package org.apache.spark.graftaccess

import org.apache.spark.SparkContext

/** Bridge to the private[spark] listener bus drain — needed so the tuner
  * can flush a complete run before persisting (the bus is async). Same
  * technique spark-testing-base uses; no Spark internals are modified. */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
