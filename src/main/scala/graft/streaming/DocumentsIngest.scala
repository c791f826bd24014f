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


  def stream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(s"$dir/{documents.parquet}")

  /** Stream-derived sketch rows (doc_id, fp) — identical projection to the
    * batch index build. */
  def sketchRows(docs: DataFrame): DataFrame =
    graft.ml.NearDup.winnowFingerprints(docs)

  /** Append the streamed sketch rows to a parquet index directory (the
    * deployment shape — shared sink protocol, see Sinks). */
  def runSketchSink(spark: SparkSession, dir: String, outPath: String,
      checkpoint: String): Unit =
    Sinks.parquetOnce(sketchRows(stream(spark, dir)), outPath, checkpoint)

  /** One-shot streamed sketch build over all available input (memory sink)
    * — the CORRECTNESS entry point. Memoized per statement window. */
  def sketchOnce(spark: SparkSession, dir: String): DataFrame =
    graft.util.Caches.memoize(s"stream:winnowsketch:$dir") {
      Sinks.memoryOnce(spark, "graft_stream_wsk",
        sketchRows(stream(spark, dir)))
    }

  /** Incremental maintenance of the (fp, df) document-frequency sibling
    * (Catalog.winnowDf): each micro-batch appends its OWN fingerprint
    * counts as a delta generation — counting only the batch, never
    * rescanning the stored sketch (VERDICT r9 #1). Reading the table is a
    * sum over delta generations, which Compact.mergeDfGenerations folds
    * back to one row per fp at compaction cadence. */
  def runDfDeltaSink(spark: SparkSession, dir: String, deltaPath: String,
      checkpoint: String): Unit = {
    val writeBatch: (DataFrame, Long) => Unit = (batch, _) => {
      batch.groupBy("fp")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("df"))
        .write.mode("append").parquet(deltaPath)
      ()
    }
    val q = sketchRows(stream(spark, dir))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(writeBatch)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One-shot streamed df maintenance — the CORRECTNESS entry point: stream
    * the docs through the delta sink into a fresh scratch generation dir,
    * then return the generation fold (sum per fp), which must equal the
    * batch-computed document frequency. Memoized per statement window; the
    * scratch dir is cleared first so re-runs across statement windows never
    * double-append. */
  def dfOnce(spark: SparkSession, dir: String, scratchBase: String): DataFrame =
    graft.util.Caches.memoize(s"stream:winnowdf:$dir:$scratchBase") {
      graft.ingest.Compact.rmTree(scratchBase)
      runDfDeltaSink(spark, dir, s"$scratchBase/deltas", s"$scratchBase/ck")
      spark.read.parquet(s"$scratchBase/deltas")
        .groupBy("fp")
        .agg(org.apache.spark.sql.functions.sum("df").as("df"))
    }

  /** One-shot streamed-then-compacted sketch — the CORRECTNESS entry point
    * for compaction: run the parquet sketch sink (the deployment appender,
    * small files per micro-batch), compact the accumulated files into one
    * sorted fp-keyed generation, flip the MANIFEST pointer onto it
    * (Compact.compactAndFlip — the atomic reader swap), and return the rows
    * read back THROUGH the manifest — which must equal the batch-built
    * sketch exactly. The explicit partition count keeps the generation a
    * genuinely smaller file set than the raw streamed sink (a deployment
    * derives it from input bytes / target file size). */
  def compactedSketchOnce(spark: SparkSession, dir: String,
      scratchBase: String): DataFrame =
    graft.util.Caches.memoize(s"stream:winnowcompact:$dir:$scratchBase") {
      graft.ingest.Compact.rmTree(scratchBase)
      runSketchSink(spark, dir, s"$scratchBase/raw", s"$scratchBase/ck")
      graft.ingest.Compact.compactAndFlip(spark, s"$scratchBase/raw",
        s"$scratchBase/idx", "fp", Seq("fp", "doc_id"),
        partitions = Some(4))
    }

  /** Incremental maintenance of the positional span sketch
    * (Catalog.spanSketch): new documents stream through the SAME shingle
    * projection the batch build uses (SpanDedup.spanShingles — stateless
    * per-row, no shuffle) and append. One-shot memory-sink entry point;
    * the parquet deployment shape is compactedSpanSketchOnce below. */
  def spanSketchOnce(spark: SparkSession, dir: String): DataFrame =
    graft.util.Caches.memoize(s"stream:spansketch:$dir") {
      Sinks.memoryOnce(spark, "graft_stream_ssk",
        graft.ml.SpanDedup.spanShingles(stream(spark, dir)))
    }

  /** Streamed-then-compacted span sketch — the winnow_compact twin for the
    * positional sketch: parquet appender per micro-batch, fold the small
    * files into one sorted h-keyed generation, flip the MANIFEST, read back
    * through it; must equal the batch-built projection row-for-row. */
  def compactedSpanSketchOnce(spark: SparkSession, dir: String,
      scratchBase: String): DataFrame =
    graft.util.Caches.memoize(s"stream:spancompact:$dir:$scratchBase") {
      graft.ingest.Compact.rmTree(scratchBase)
      Sinks.parquetOnce(graft.ml.SpanDedup.spanShingles(stream(spark, dir)),
        s"$scratchBase/raw", s"$scratchBase/ck")
      graft.ingest.Compact.compactAndFlip(spark, s"$scratchBase/raw",
        s"$scratchBase/idx", "h", Seq("h", "doc_id", "pos"),
        partitions = Some(4))
    }
}
