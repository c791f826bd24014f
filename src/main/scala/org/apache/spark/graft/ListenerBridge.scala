package org.apache.spark.graft

import org.apache.spark.SparkContext

/** The one `private[spark]` doorway the bench counters need: listener
  * events are delivered asynchronously, so reading a counter snapshot
  * right after an action races the bus — the deltas would smear across
  * neighboring queries. `waitUntilEmpty` drains the bus first, making
  * per-entry {jobs, stages, shuffle, task-time} deltas exact (VERDICT r13
  * #4: bench disputes must be decidable from data, which requires the
  * counters to be attributable). Lives under org.apache.spark to reach the
  * package-private accessor; no Spark internals are modified.
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
