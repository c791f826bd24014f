package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class DotProductSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("graft_dot == interpreted aggregate/zip_with on float and double arrays") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat),
        Array.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "f", "d")
    val legacy = aggregate(
      zip_with(transform(col("f"), _.cast("double")), col("d"), _ * _),
      lit(0.0), (acc, v) => acc + v)
    val both = df.select(
      call_function("graft_dot", col("f"), col("d")).as("native"), legacy.as("interp"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // identical IEEE sequence
    }
  }

  test("graft_dot: null inputs yield null, works in SQL text") {
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    val r = df.select(call_function("graft_dot", col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
    df.createOrReplaceTempView("dp_t")
    val s = spark.sql("SELECT graft_dot(a, a) FROM dp_t").collect().head
    assert(s.getDouble(0) == 5.0)
  }
}
