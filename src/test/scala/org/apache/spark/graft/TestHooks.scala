package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge into `private[spark]` surface: lets specs drain the
  * async listener bus so job-count assertions are deterministic instead
  * of sleep-based.
  */
object TestHooks {
  def waitListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
