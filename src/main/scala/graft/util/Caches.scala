package graft.util

import org.apache.spark.sql.DataFrame

/** Session-scoped registry of internally cache()d DataFrames so long-lived
  * callers (Shell statement loops, Verify's 60-entry run) can release them
  * after each statement materializes, instead of accumulating cached
  * partitions until memory pressure (ADVICE r3: CorrelateExec/Ann/NearDup
  * cache without unpersisting; Bench only masked it with clearCache).
  *
  * Operators call `track(df.cache())`; presenters/drivers call `drain()`
  * AFTER the final plan is materialized (collect/write), which is the only
  * point the cache has finished its job.
  */
object Caches {
  private val tracked = new ThreadLocal[List[DataFrame]] {
    override def initialValue: List[DataFrame] = Nil
  }

  def track(df: DataFrame): DataFrame = {
    tracked.set(df :: tracked.get)
    df
  }

  /** Unpersist every tracked DataFrame (non-blocking) and clear the list. */
  def drain(): Unit = {
    tracked.get.foreach(df => try df.unpersist(false) catch { case _: Throwable => () })
    tracked.set(Nil)
  }
}
