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

  test("the store is genuinely byte-wide") {
    // the 4x claim rests on the element TYPE: array<tinyint> is 1 byte per
    // element in Tungsten rows and bit-packed in parquet — an int32 array
    // wearing a uint8 name would be the same width as the float32 it
    // replaces
    val store = Quant.sq8Store(Catalog.embeddings(spark, dir))
    val et = store.schema("codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(et == org.apache.spark.sql.types.ByteType, s"element type $et")
    assert(store.columns.toSeq == Seq("vec_id", "codes", "mn", "scale"))
  }

  test("the entry's lookup plan reads the materialized store, not embeddings") {
    val p = SparkEntry.queries("emb_topk_sq8")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("sq8_codes"), s"plan does not scan sq8_codes:\n$p")
    assert(!p.toLowerCase.contains("embeddings.parquet"),
      s"sq8 lookup re-reads raw embeddings:\n$p")
    graft.util.Caches.drain()
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

  test("constant corpus quantizes to code 0 (stored -128), no division by zero") {
    import spark.implicits._
    val const = Seq((0L, Array.fill(4)(0.5f)), (1L, Array.fill(4)(0.5f)))
      .toDF("vec_id", "embedding")
    val r = Quant.sq8Store(const).select(explode(col("codes")).as("c"))
      .agg(min("c"), max("c")).head
    assert(r.getByte(0) == -128 && r.getByte(1) == -128)
  }
}
