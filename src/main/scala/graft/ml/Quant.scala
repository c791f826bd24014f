package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of the embedding corpus — the STORAGE-scale
  * path for similarity search: a 100 TB float32 embedding store shrinks 4×
  * as 1-byte codes under a global affine map (code = round((x − mn) /
  * scale), scale = (mx − mn)/255), at a small, measured ranking cost
  * (QuantSpec bounds it). This is the standard "scalar quantization (SQ8)"
  * baseline of vector-search engines — the simplest member of the family
  * whose far end is product quantization; the reference engine stores
  * float scores, so this is pipeline-beyond-reference surface like the
  * rest of ml/.
  *
  * The store really is byte-wide: codes are shifted by −128 into TINYINT
  * range, so each element is 1 byte in Tungsten rows and bit-packed in
  * parquet — the claimed 4× win vs float32, not an int32 array wearing a
  * uint8 name. The trained affine map (mn, scale) ships WITH the store as
  * two constant columns (they compress to nothing and keep the index
  * self-contained, the way a real SQ index ships its quantizer).
  *
  * Search runs on values DEQUANTIZED FROM THE STORE (xq = mn +
  * (code+128)·scale) — raw embeddings are never touched at lookup time —
  * so the whole quantize → store → dequantize → rank path is exercised
  * and the DuckDB oracle mirrors it bit-identically: mn/mx are corpus
  * aggregates over double-widened inputs, every arithmetic step is the
  * same IEEE double op on both engines, and codes are exact integers.
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

  /** (vec_id, codes array<tinyint>, mn, scale) — the PERSISTABLE 4×-smaller
    * store (Catalog.sq8Store materializes it). */
  def sq8Store(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("emb"))
    e.crossJoin(broadcast(stats(e)))
      .select(col("vec_id"), expr(
        "transform(emb, x -> CAST(CAST(round((x - mn) / scale, 0) AS INT) - 128 AS TINYINT))")
        .as("codes"),
        col("mn"), col("scale"))
  }

  /** Dequantized vectors derived from the STORE alone. */
  private def dequant(store: DataFrame): DataFrame =
    store.select(col("vec_id"), expr(
      "transform(codes, c -> mn + (CAST(c AS INT) + 128) * scale)").as("emb"))

  /** Top-k by cosine over the dequantized STORE, query vector quantized
    * through the same map (the standard symmetric-distance SQ setup).
    * Returns (vec_id, sim). */
  def sq8TopKFrom(store: DataFrame, qVecId: Long, k: Int): DataFrame = {
    val deq = graft.util.Caches.track(dequant(store).cache())
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

  /** Ad-hoc overload for in-memory corpora: derives the store inline. */
  def sq8TopK(emb: DataFrame, qVecId: Long, k: Int): DataFrame =
    sq8TopKFrom(sq8Store(emb), qVecId, k)

  /** DuckDB mirror of sq8TopKFrom ∘ sq8Store: same double-widening
    * (Ann.BaseSrcSql — the shared embedding oracle source), same global
    * (mn, scale) aggregate, same round-to-int code (the ±128 shift cancels
    * in the dequant and is omitted), same dequantized cosine. */
  def sq8OracleSql(qVecId: Long, k: Int): String =
    s"""WITH e AS (${Ann.BaseSrcSql}),
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
