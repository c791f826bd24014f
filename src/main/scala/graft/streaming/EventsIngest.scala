package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.Catalog

/** §2.9 — Structured Streaming ingest of the `events` stream. The reference
  * has no streaming runtime (ingestion = batch generations + k-way merge,
  * SURVEY §2.9); this is the Spark-native replacement:
  *
  *  - `postings`: stateless map of events → index-shaped postings
  *    (key = "event:" + type, off = epoch-SECONDS timestamp — the reference's
  *    time-series convention, src/ca-load.cc:296-314), appended to a parquet
  *    sink. At scale this is the always-on writer that replaces re-running
  *    ca-load per generation.
  *  - `dailyCounts`: event-time tumbling-window aggregation with a watermark
  *    for late data.
  */
object EventsIngest {

  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The raw event stream (nanos → timestamp, same as the batch reader). */
  def stream(spark: SparkSession, dir: String): DataFrame =
    // The glob braces make the file-stream source treat `dir` as basePath
    // (a bare file path is rejected — basePath must be a directory).
    spark.readStream.schema(Catalog.eventsSchema)
      .parquet(s"$dir/{events.parquet}")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Index-shaped postings from the stream (stateless — no shuffle,
    * no state store). */
  def postings(events: DataFrame): DataFrame =
    events.select(
      concat(lit("event:"), col("event_type")).as("key"),
      unix_timestamp(col("ts")).as("off"),
      col("value").as("score"))

  /** Run the stateless postings sink to parquet until all currently-available
    * input is processed (Trigger.AvailableNow — the batch-of-the-stream mode;
    * a deployment would run the same query continuously). */
  def runPostingsSink(spark: SparkSession, dir: String, outPath: String,
      checkpoint: String): Unit = {
    val q = postings(stream(spark, dir))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start(outPath)
    q.awaitTermination()
  }

  /** Watermarked daily tumbling-window counts per event type. */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** Session windows per user — events closer than `gap` to their
    * predecessor merge into one session (`session_window`: identical
    * semantics in batch and streaming, the idiomatic stateful-aggregation
    * shape for sessionization — no hand-rolled mapGroupsWithState needed).
    * Returns (user_id, session_start epoch-sec, n_events, sum_value).
    * Scale: state is partitioned by user_id; the watermark (streaming
    * variant) bounds state retention. */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("w.start")).as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming variant: watermarked session windows (append mode emits a
    * session once the watermark passes its close). */
  def sessionsStream(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    sessions(events.withWatermark("ts", "1 day"), gap)

  /** Streaming exact dedup — one row per (user_id, event_type, day), emitted
    * the first time the key is seen. `dropDuplicatesWithinWatermark` keys the
    * state store on the dedup columns and the watermark expires a key's state
    * once its day can no longer recur; all duplicates of a key fall inside
    * that key's day, so expiry never re-admits one. The training-pipeline
    * shape: exact dedup of an unbounded stream with BOUNDED state — at 100 TB
    * the state store is key-partitioned and holds one entry per key, not the
    * rows (vs. a plain dropDuplicates whose state grows forever). */
  def dedupDaily(events: DataFrame): DataFrame =
    events
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .withWatermark("ts", "2 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "day")
      .select(col("user_id"), col("event_type"), col("day"))

  /** One-shot streaming dedup over all available input (append mode — rows
    * flow out in the micro-batch where their key is first seen). */
  def dedupDailyOnce(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_stream_dedup_${runId.incrementAndGet()}"
    val q = dedupDaily(stream(spark, dir))
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  /** One-shot daily counts: run the windowed aggregation over all available
    * input (complete mode → in-memory sink) and return the result table.
    * This is the CORRECTNESS entry point — the same aggregation the batch
    * `ev_daily_counts` query does, produced by the streaming engine. */
  def dailyCountsOnce(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_stream_daily_${runId.incrementAndGet()}"
    val q = dailyCounts(stream(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
