package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of the embedding corpus — the STORAGE-scale
  * path for similarity search: a 100 TB float32 embedding store shrinks 4×
  * as uint8 codes under a global affine map (code = round((x − mn) /
  * scale), scale = (mx − mn)/255), at a small, measured cosine error
  * (QuantSpec bounds it). This is the standard "scalar quantization (SQ8)"
  * baseline of vector-search engines — the simplest member of the family
  * whose far end is product quantization; the reference engine stores
  * float scores, so this is pipeline-beyond-reference surface like the
  * rest of ml/.
  *
  * Search runs on DEQUANTIZED values (xq = mn + code·scale) so the whole
  * quantize → store → dequantize → rank path is exercised and the DuckDB
  * oracle can mirror it bit-identically: mn/mx are corpus aggregates over
  * double-widened inputs, every arithmetic step is the same IEEE double op
  * on both engines, and codes are exact integers. The (mn, mx) pair is a
  * ONE-ROW aggregate — broadcast-clean by policy; at 100 TB the codes
  * table is what gets stored/partitioned (Catalog-materializable exactly
  * like annBuckets) while the two floats ride the plan as a scalar.
  */
object Quant {

  /** The one-row global (mn, scale) stats — scale degenerate-guarded so a
    * constant corpus quantizes to code 0 instead of dividing by zero. */
  private def stats(e: DataFrame): DataFrame =
    e.agg(min(array_min(col("emb"))).as("mn"),
        max(array_max(col("emb"))).as("mx"))
      .select(col("mn"),
        when(col("mx") === col("mn"), lit(1.0))
          .otherwise((col("mx") - col("mn")) / 255.0).as("scale"))

  /** (vec_id, codes array<int>) — the PERSISTABLE 4×-smaller store. */
  def sq8Codes(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    e.crossJoin(broadcast(stats(e)))
      .select(col("vec_id"), expr(
        "transform(emb, x -> CAST(round((x - mn) / scale, 0) AS INT))")
        .as("codes"))
  }

  /** Top-k by cosine over the DEQUANTIZED codes, query vector quantized
    * through the same map (the standard symmetric-distance SQ setup).
    * Returns (vec_id, sim). */
  def sq8TopK(emb: DataFrame, qVecId: Long, k: Int): DataFrame = {
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    val deq = graft.util.Caches.track(
      e.crossJoin(broadcast(stats(e)))
        .select(col("vec_id"), expr(
          "transform(emb, x -> mn + CAST(round((x - mn) / scale, 0) AS INT) * scale)")
          .as("emb"))
        .cache())
    val q = broadcast(deq.filter(col("vec_id") === qVecId)
      .select(col("emb").as("qemb")))
    def dot(a: Column, b: Column): Column =
      call_function("graft_dot", a, b)
    deq.filter(col("vec_id") =!= qVecId).crossJoin(q)
      .select(col("vec_id"),
        round(dot(col("emb"), col("qemb")) /
          sqrt(dot(col("emb"), col("emb")) * dot(col("qemb"), col("qemb"))), 6)
          .as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
  }

  /** DuckDB mirror of sq8TopK: same double-widening, same global (mn,
    * scale) aggregate, same round-to-int code, same dequantized cosine. */
  def sq8OracleSql(qVecId: Long, k: Int): String =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |st AS (SELECT mn, CASE WHEN mx = mn THEN 1.0 ELSE (mx - mn) / 255.0 END AS scale
       |       FROM (SELECT min(u) AS mn, max(u) AS mx
       |             FROM (SELECT unnest(emb) AS u FROM e))),
       |dq AS (SELECT vec_id,
       |         list_transform(emb, x -> mn + CAST(round((x - mn) / scale) AS INT) * scale) AS emb
       |       FROM e, st),
       |q AS (SELECT emb AS qemb FROM dq WHERE vec_id = $qVecId)
       |SELECT dq.vec_id AS vec_id,
       |  round(list_dot_product(dq.emb, q.qemb) /
       |    sqrt(list_dot_product(dq.emb, dq.emb) * list_dot_product(q.qemb, q.qemb)), 6) AS sim
       |FROM dq, q WHERE dq.vec_id <> $qVecId
       |ORDER BY sim DESC, vec_id LIMIT $k
       |""".stripMargin.replaceAll("\\s+", " ")
}
