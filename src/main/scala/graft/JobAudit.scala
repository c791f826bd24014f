package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Diagnostic main: run one entry and print every scheduled job's callsite —
  * the tool behind the per-entry jobs-counter audits (which wave is a
  * listing job, a broadcast build, an AQE stage, a bounded collect). Not
  * part of the serving surface; kept for the next audit. */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val rddNames = e.stageInfos
          .flatMap(_.rddInfos.map(_.name)).distinct.mkString(",")
        jobs.add(s"job ${e.jobId} stages=${e.stageInfos.size} " +
          s"tasks=${e.stageInfos.map(_.numTasks).sum} rdds=[$rddNames]")
        ()
      }
    })
    // warm run (store materialization, codegen)
    SparkEntry.queries(name)(spark, sfDir).count()
    graft.util.Caches.drain()
    spark.catalog.clearCache()
    org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
    jobs.clear()
    // measured run
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
    println(s"=== $name: ${jobs.size} jobs, ${f"$sec%.2f"}s ===")
    jobs.forEach(j => println(j))
    spark.stop()
  }
}
