package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Incremental maintenance of the materialized winnowing sketch
  * (Catalog.winnowSketch): new documents stream through the SAME
  * fingerprint pipeline the batch build uses (NearDup.winnowFingerprints —
  * pure per-row projection, no state store, no shuffle) and append to the
  * stored index. Paired with NearDup.incrementalDupesFrom this closes the
  * ingest loop: stream fingerprints in, admission-check the new batch
  * against the existing sketch, corpus text never re-read — the text-side
  * twin of EmbeddingsIngest's ANN index upkeep.
  */
object DocumentsIngest {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  def stream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(s"$dir/{documents.parquet}")

  /** Stream-derived sketch rows (doc_id, fp) — identical projection to the
    * batch index build. */
  def sketchRows(docs: DataFrame): DataFrame =
    graft.ml.NearDup.winnowFingerprints(docs)

  /** Append the streamed sketch rows to a parquet index directory (the
    * deployment shape: same layout the batch materialization writes). */
  def runSketchSink(spark: SparkSession, dir: String, outPath: String,
      checkpoint: String): Unit = {
    val q = sketchRows(stream(spark, dir))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start(outPath)
    q.awaitTermination()
  }

  /** One-shot streamed sketch build over all available input (memory sink)
    * — the CORRECTNESS entry point. Memoized per statement window. */
  def sketchOnce(spark: SparkSession, dir: String): DataFrame =
    graft.util.Caches.memoize(s"stream:winnowsketch:$dir") {
      val name = s"graft_stream_wsk_${runId.incrementAndGet()}"
      val q = sketchRows(stream(spark, dir))
        .writeStream
        .outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(name)
    }
}
