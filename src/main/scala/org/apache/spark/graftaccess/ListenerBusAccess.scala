package org.apache.spark.graftaccess

import org.apache.spark.SparkContext

/** Bridge to the private[spark] listener bus drain — needed so the tuner
  * can flush a complete run before persisting (the bus is async). Same
  * technique spark-testing-base uses; no Spark internals are modified. */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()

  /** Deliver SparkListenerApplicationEnd through the real bus WITHOUT
    * stopping the context — lets a spec exercise the flight-recorder
    * flush path in the shared-session test JVM (an actual stop() would
    * kill every other suite's session). */
  def postApplicationEnd(sc: SparkContext): Unit =
    sc.listenerBus.post(
      org.apache.spark.scheduler.SparkListenerApplicationEnd(System.currentTimeMillis()))
}
