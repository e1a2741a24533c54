package org.apache.spark.graft.runtime

import org.apache.spark.SparkContext

/** `private[spark]` bridge: drain the async listener bus so tools that
  * aggregate task metrics through a SparkListener read a complete set
  * before summarizing ([[graft.tools.JoinScaleStress]]).
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
