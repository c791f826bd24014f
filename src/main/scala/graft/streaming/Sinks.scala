package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The ONE streaming sink protocol shared by the always-on index/table
  * writers (documents, embeddings, overrides, event postings): a parquet
  * append sink (the deployment shape — same layout the batch
  * materializations write) and a memory-sink one-shot (the CORRECTNESS
  * entry-point shape). Sink setup lives in exactly one place so options,
  * trigger mode, and the drain-tracking rule (ADVICE r9: every one-shot
  * sink table must be registered for Caches.drain or it pins rows in
  * driver memory for the session) cannot drift between ingest families.
  * EventsIngest keeps its own one-shot variant deliberately — its stateful
  * streams need a cloned session with bounded state partitions, a
  * different protocol, not a drifted copy of this one. */
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

  /** Drain all currently-available input into a tracked memory-sink table
    * and return it (dropped again by Caches.drain at statement-window
    * end). */
  def memoryOnce(spark: SparkSession, prefix: String,
      rows: DataFrame): DataFrame = {
    val name = s"${prefix}_${runId.incrementAndGet()}"
    val q = rows.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.util.Caches.trackSinkTable(spark, name)
    spark.table(name)
  }

  /** Complete-mode one-shot for streaming AGGREGATIONS whose state is
    * bounded by construction (sketch grids, register sets) — append mode
    * would never emit rows that keep updating. */
  def memoryCompleteOnce(spark: SparkSession, prefix: String,
      rows: DataFrame): DataFrame = {
    val name = s"${prefix}_${runId.incrementAndGet()}"
    val q = rows.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.util.Caches.trackSinkTable(spark, name)
    spark.table(name)
  }
}
