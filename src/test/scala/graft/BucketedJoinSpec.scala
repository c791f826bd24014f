package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.Catalog

/** Evidence for the SCALE.md co-location claim: with the index bucketed by
  * `off`, the posting-algebra joins (all keyed on `off`) plan with NO
  * shuffle on either side — the layout a 100 TB deployment uses so that
  * AND/SUBTRACT/ORDER BY run co-partitioned. */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("bucketed-by-off index: AND joins with zero Exchange, same result") {
    val idx = Catalog.bucketedIndex(spark, dir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val a = idx.filter(col("key") === "price").select("off", "score")
      val b = idx.filter(col("key") === "qty").select("off", "score")
      val joined = graft.operators.PostingAlgebra.and(a, b)
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")

      // identical multiset as the unbucketed layout
      val ub = Catalog.index(spark, dir)
      val expected = graft.operators.PostingAlgebra.and(
        ub.filter(col("key") === "price").select("off", "score"),
        ub.filter(col("key") === "qty").select("off", "score")).count()
      assert(n == expected && n > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
