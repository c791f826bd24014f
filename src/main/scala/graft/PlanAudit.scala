package graft

/** Diagnostic main: print an entry's formatted physical plan (the
  * .explain("formatted") the plan audits read) without editing any spec. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.count() // let AQE finalize
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
