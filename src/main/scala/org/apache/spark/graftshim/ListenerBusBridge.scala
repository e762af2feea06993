package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/** Bridge into the private[spark] listener bus — lets tests drain
  * queued listener events DETERMINISTICALLY before reading counters
  * (the public addSparkListener path is async, so a job-count
  * assertion without a drain races the bus). */
object ListenerBusBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
