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
  /** Best-effort drain: the no-arg waitUntilEmpty throws TimeoutException
    * after ~10 s if the bus is still busy — exactly the loaded-machine
    * regime the counters exist to measure, so a slow drain must degrade to
    * a slightly-smeared snapshot, never abort the bench run. */
  def waitUntilEmpty(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
