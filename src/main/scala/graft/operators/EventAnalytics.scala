package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics operators over the event stream — rolling active users,
  * conversion funnels, retention cohorts. These are the aggregate shapes an
  * events warehouse answers daily; each is formulated as bounded
  * hash-shuffles (per-user or per-day keys), no window self-joins, no
  * driver-side state, so the plan is identical at 100 TB.
  */
object EventAnalytics {

  /** Rolling distinct active users: for every calendar day `d` in the
    * observed span [min day, max day], the number of distinct users active
    * in the trailing `days`-day window [d−days+1, d] — a DENSE series, so an
    * interior day with zero events still appears (with the count its
    * non-empty trailing window implies, or 0). Formulation: the (user, day)
    * activity set is deduped FIRST (one row per user-day — the shuffle
    * carries the reduced set, not raw events), each activity row then covers
    * the `days` window anchors it contributes to via a bounded explode, and
    * a distinct-aggregate per anchor day finishes; a generated calendar grid
    * (one-row span aggregate, broadcast) zero-fills the gaps and truncates
    * partial windows past the last observed day. A windowed COUNT(DISTINCT)
    * can't be expressed as a Spark window function at all; this explode form
    * is the standard scale-out rewrite, linear in |activity| × days. */
  def rollingActiveUsers(events: DataFrame, days: Int): DataFrame = {
    val act = events
      .select(col("user_id"),
        unix_date(to_date(col("ts"))).cast("long").as("day"))
      .distinct()
    val grid = act.agg(min("day").as("lo"), max("day").as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("d"))
    act
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + (days - 1))).as("d"))
      .groupBy("d")
      .agg(countDistinct("user_id").as("au"))
      .join(grid, Seq("d"), "right")
      .select(col("d"), coalesce(col("au"), lit(0L)).as("active_users"))
  }

  /** Conversion funnel: per user with a `from` event, the first `from`
    * timestamp and the first `to` event AT or after it (null = not yet
    * converted). The conditional min keeps unconverted users in the result —
    * a post-join filter would silently drop exactly the rows a funnel
    * exists to count. Two shuffles, both on user_id. */
  def funnel(events: DataFrame, from: String, to: String): DataFrame = {
    val first = events.filter(col("event_type") === from)
      .groupBy("user_id").agg(min("ts").as("from_ts"))
    val target = events.filter(col("event_type") === to)
      .select(col("user_id"), col("ts"))
    first.join(target, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("from_ts"))
      .agg(min(when(col("ts") >= col("from_ts"), col("ts"))).as("to_ts"))
      .select(col("user_id"), col("from_ts"), col("to_ts"),
        col("to_ts").isNotNull.as("converted"))
  }

  /** Retention triangle: users bucketed by first-seen day (cohort), counted
    * distinct per (cohort, k = days since cohort) they were active. The
    * cohort table is per-user scalars (aggregated before the join), so the
    * join is reduced × reduced on user_id. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val act = events
      .select(col("user_id"),
        unix_date(to_date(col("ts"))).cast("long").as("day"))
      .distinct()
    val cohorts = act.groupBy("user_id").agg(min("day").as("cohort"))
    act.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("k"))
      .agg(countDistinct("user_id").as("n"))
  }
}
