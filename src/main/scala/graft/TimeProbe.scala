package graft

import org.apache.spark.sql.functions._

/** Diagnostic main: time isolated sub-plans of a slow entry. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
    }
    val l = graft.model.Catalog.table(spark, sfDir, "lineitem")
    time("lineitem count")(l.count())
    time("lineitem to_date")(
      l.select(to_date(col("l_shipdate")).as("sd")).filter(col("sd").isNotNull).count())
    time("lineitem bucket")(
      l.select(floor(unix_date(to_date(col("l_shipdate"))) / 7).as("b"))
        .filter(col("b").isNotNull).count())
    val o = graft.model.Catalog.table(spark, sfDir, "orders")
      .filter(col("o_totalprice") > 450000)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d0"),
        date_add(to_date(col("o_orderdate")), 7).as("d1"))
    time("orders filtered")(o.count())
    time("full entry")(SparkEntry.queries("range_join_days")(spark, sfDir).count())
    spark.stop()
  }
}
