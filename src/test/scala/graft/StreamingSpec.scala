package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.Catalog
import graft.streaming.EventsIngest

/** Structured Streaming ingest (SURVEY §2.9): the streaming pipelines must
  * produce exactly what the equivalent batch derivation produces over the
  * same files. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("postings sink: stream output == batch derivation") {
    val out = Files.createTempDirectory("graft-stream").toString
    EventsIngest.runPostingsSink(spark, dir, s"$out/postings", s"$out/ckpt")
    val streamed = spark.read.parquet(s"$out/postings")
    val batch = Catalog.events(spark, dir).select(
      concat(lit("event:"), col("event_type")).as("key"),
      unix_timestamp(col("ts")).as("off"),
      col("value").as("score"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("windowed daily counts: stream (complete mode) == batch aggregation") {
    val streamed = EventsIngest.dailyCountsOnce(spark, dir)
    val batch = Catalog.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("custom-state user profiles: final stream update == batch aggregate") {
    // flatMapGroupsWithState merges events commutatively, so each user's
    // LAST emitted update must equal the batch lifetime groupBy regardless
    // of micro-batch slicing
    val streamed = EventsIngest.userProfilesOnce(spark, dir)
    val batch = Catalog.events(spark, dir)
      .groupBy("user_id")
      .agg(min(unix_timestamp(col("ts"))).as("first_sec"),
        max(unix_timestamp(col("ts"))).as("last_sec"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("streaming dedup within watermark == batch distinct") {
    // every duplicate of a (user, type, day) key lands inside that day, so
    // watermark expiry never re-admits one — streaming == batch DISTINCT
    val streamed = EventsIngest.dedupDailyOnce(spark, dir)
    val batch = Catalog.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .distinct()
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("session windows: streaming append == batch sessions (finalized subset)") {
    val out = Files.createTempDirectory("graft-stream-sess").toString
    val q = EventsIngest.sessionsStream(EventsIngest.stream(spark, dir))
      .writeStream
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode("append")
      .format("parquet")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$out/sessions")
    q.awaitTermination()
    val emitted = spark.read.parquet(s"$out/sessions")
    val batch = EventsIngest.sessions(Catalog.events(spark, dir))
    // every emitted (finalized) session must byte-match the batch plan's
    assert(emitted.exceptAll(batch).count() == 0)
    assert(emitted.count() > 0) // watermark passed: sessions actually emitted
    // sessionization sanity on the batch side: no session exceeds its events
    val bad = batch.filter(col("n_events") <= 0)
    assert(bad.count() == 0)
  }

  test("append mode with watermark emits only finalized windows") {
    // Drip the file through in one batch; with append mode the engine holds
    // back windows not yet past the watermark — the emitted set must be a
    // subset of the batch result and must not contain the max-event-time day.
    val out = Files.createTempDirectory("graft-stream-append").toString
    val q = EventsIngest.dailyCounts(EventsIngest.stream(spark, dir))
      .writeStream
      .option("checkpointLocation", s"$out/ckpt")
      .outputMode("append")
      .format("parquet")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(s"$out/daily")
    q.awaitTermination()
    val emitted = spark.read.parquet(s"$out/daily")
    val batch = Catalog.events(spark, dir)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
    assert(emitted.exceptAll(batch).count() == 0) // subset, rows identical
  }

  test("streamed ANN bucket rows == batch index build (incremental upkeep)") {
    val streamed = graft.streaming.EmbeddingsIngest.bucketsOnce(spark, dir)
    val batch = graft.ml.Ann.bucketIds(Catalog.embeddings(spark, dir))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-stream interval join == batch interval join") {
    val streamed = EventsIngest.intervalJoinOnce(spark, dir)
    val ev = Catalog.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val batch = p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("interval 1 hour") &&
        col("v_ts") <= col("p_ts"))
      .select("user_id", "p_ts", "v_ts")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("left-outer interval join == batch left join on the resolved region") {
    // null emission is WATERMARK-FORCED: a purchase emits unmatched only
    // once the view watermark proves no future pair. Purchases younger than
    // (max ts − watermark) are unresolved when the one-shot drains, so the
    // comparison restricts both sides to a 2-day cutoff.
    val ev = Catalog.events(spark, dir)
    val cutoff = ev.agg(max("ts")).head.getTimestamp(0).toInstant
      .minus(java.time.Duration.ofDays(2))
    val streamed = EventsIngest.intervalJoinLeftOnce(spark, dir)
      .filter(col("p_ts") <= lit(java.sql.Timestamp.from(cutoff)))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val batch = p.join(v, col("user_id") === col("v_user") &&
        col("v_ts") >= col("p_ts") - expr("interval 1 hour") &&
        col("v_ts") <= col("p_ts"), "left_outer")
      .select("user_id", "p_ts", "v_ts")
      .filter(col("p_ts") <= lit(java.sql.Timestamp.from(cutoff)))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    // the unmatched (null) half must be present, not vacuously equal
    assert(streamed.filter(col("v_ts").isNull).count() > 0)
  }

  test("streamed winnow sketch == batch sketch (text index upkeep)") {
    val streamed = graft.streaming.DocumentsIngest.sketchOnce(spark, dir)
    val batch = graft.ml.NearDup.winnowFingerprints(
      Catalog.documents(spark, dir))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stream-static enrichment: streamed segment aggregate == batch join") {
    val streamed = EventsIngest.enrichedOnce(spark, dir)
    val batch = Catalog.events(spark, dir)
      .join(Catalog.table(spark, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment")),
        Seq("user_id"))
      .groupBy("segment", "event_type")
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }
}
