package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Quant
import graft.model.Catalog

/** Scalar int8 quantization (Quant): codes must be genuine uint8, the
  * dequantized ranking must stay close to the exact float ranking (the
  * whole point of SQ8 — 4× smaller store, small recall cost), and a
  * constant corpus must not divide by zero. */
class QuantSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"
  private val K = 10

  test("codes are uint8-range ints") {
    val c = Quant.sq8Codes(Catalog.embeddings(spark, dir))
      .select(explode(col("codes")).as("c"))
      .agg(min("c"), max("c")).head
    assert(c.getInt(0) >= 0 && c.getInt(1) <= 255,
      s"codes outside uint8: ${c.getInt(0)}..${c.getInt(1)}")
  }

  test("dequantized top-10 overlaps the exact top-10") {
    val emb = Catalog.embeddings(spark, dir)
    val e = emb.select(col("vec_id"), col("embedding").as("emb"))
    val q = broadcast(e.filter(col("vec_id") === 0).select(col("emb").as("qemb")))
    val d = call_function("graft_dot", col("emb"), col("qemb"))
    val na = call_function("graft_dot", col("emb"), col("emb"))
    val nb = call_function("graft_dot", col("qemb"), col("qemb"))
    val exact = e.filter(col("vec_id") =!= 0).crossJoin(q)
      .select(col("vec_id"), (d / sqrt(na * nb)).as("sim"))
      .orderBy(desc("sim"), asc("vec_id")).limit(K)
      .collect().map(_.getLong(0)).toSet
    val sq8 = Quant.sq8TopK(emb, 0, K).collect().map(_.getLong(0)).toSet
    graft.util.Caches.drain()
    val overlap = (exact & sq8).size.toDouble / K
    info(f"sq8 top-$K overlap with exact = $overlap%.2f")
    // 8-bit codes over a [-1,1]-ish corpus: quantization noise ~(range/255)
    // per dim — the ranking should survive mostly intact
    assert(overlap >= 0.7, f"sq8 overlap $overlap%.2f below bound")
  }

  test("constant corpus quantizes to code 0, no division by zero") {
    import spark.implicits._
    val const = Seq((0L, Array.fill(4)(0.5f)), (1L, Array.fill(4)(0.5f)))
      .toDF("vec_id", "embedding")
    val codes = Quant.sq8Codes(const).select(explode(col("codes")).as("c"))
      .agg(max(abs(col("c")))).head.getInt(0)
    assert(codes == 0)
  }
}
