package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The ONE streaming sink protocol shared by the always-on index/table
  * writers (documents, embeddings, overrides, event postings): a parquet
  * append sink (the deployment shape — same layout the batch
  * materializations write), a memory-sink one-shot (the CORRECTNESS
  * entry-point shape), and the foreachBatch one-shot scaffolding the
  * delta/pair sinks ride. Sink setup lives in exactly one place so
  * options, trigger mode, and the drain-tracking rule (ADVICE r9: every
  * one-shot sink table must be registered for Caches.drain or it pins
  * rows in driver memory for the session) cannot drift between ingest
  * families. EventsIngest keeps its own one-shot variant deliberately —
  * its stateful streams need a cloned session with bounded state
  * partitions, a different protocol, not a drifted copy of this one. */
object Sinks {

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Append `rows` to a parquet directory, draining all currently-available
    * input (Trigger.AvailableNow — the batch-of-the-stream mode; a
    * deployment runs the same query continuously). */
  def parquetOnce(rows: DataFrame, outPath: String,
      checkpoint: String): Unit = {
    val q = rows.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start(outPath)
    q.awaitTermination()
  }

  /** The ONE foreachBatch one-shot: drain all currently-available input
    * through `writer` (review finding, r19 — this scaffolding existed in
    * five hand-copies across the delta/pair/compaction sinks; an option
    * change must land here exactly once). */
  def foreachBatchOnce(rows: DataFrame, checkpoint: String,
      writer: (DataFrame, Long) => Unit): Unit = {
    val q = rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(writer)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Hadoop-FileSystem existence check — NOT java.io.File, which silently
    * sees nothing when the default filesystem is hdfs:///s3a:// (ADVICE
    * r15; review finding r19: a local-disk check made the pair store's
    * zero-batch fallback fire on every remote-FS deployment). */
  def pathExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Read a stream-produced delta/store dir, or an EMPTY frame with
    * `schema` when the stream produced no batches and never created the
    * dir (a zero-input corpus terminates Trigger.AvailableNow without a
    * foreachBatch call) — the pair store's fallback generalized to every
    * delta reader, so sibling entry points cannot diverge between a
    * graceful empty result and PATH_NOT_FOUND (review finding, r19). */
  def readDeltasOrEmpty(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    if (pathExists(spark, path)) spark.read.parquet(path)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)

  /** The shared memory-sink body — mode is the only variance between the
    * append and complete one-shots, so the queryName/tracking/trigger
    * sequence has exactly one rendering. */
  private def memorySink(spark: SparkSession, prefix: String,
      rows: DataFrame, mode: String): DataFrame = {
    val name = s"${prefix}_${runId.incrementAndGet()}"
    val q = rows.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.util.Caches.trackSinkTable(spark, name)
    spark.table(name)
  }

  /** Drain all currently-available input into a tracked memory-sink table
    * and return it (dropped again by Caches.drain at statement-window
    * end). */
  def memoryOnce(spark: SparkSession, prefix: String,
      rows: DataFrame): DataFrame =
    memorySink(spark, prefix, rows, "append")

  /** Complete-mode one-shot for streaming AGGREGATIONS whose state is
    * bounded by construction (sketch grids, register sets) — append mode
    * would never emit rows that keep updating. */
  def memoryCompleteOnce(spark: SparkSession, prefix: String,
      rows: DataFrame): DataFrame =
    memorySink(spark, prefix, rows, "complete")
}
