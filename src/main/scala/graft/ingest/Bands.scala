package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Percentile-band DERIVATION at ingest — the upstream producer of the
  * band-carrying universal values the reference stores and renders
  * (/root/reference/src/ca-table.h:102-105, ca-dump.cc:168-199): per
  * (key, day-offset) group over a raw value stream, the score is the
  * discrete median and pct5/25/75/95 are the discrete quantiles.
  *
  * Quantile selection is DISCRETE: the value whose 1-based rank is
  * ceil(k·n/100), computed as (k·n+99) div 100 in pure integer arithmetic.
  * Outputs are raw data values — no FP interpolation whose op order could
  * differ between engines — and the rank rule is mirrored verbatim by the
  * DuckDB oracle (`bandsOracleSql`).
  *
  * Scale: one shuffle co-partitions by (key, off); the rank window sorts
  * within each bounded group (one key-day of events), never globally. For
  * pathologically hot key-days at 100 TB the drop-in alternative is
  * approx_percentile (t-digest, partial-aggregated, no window) at the cost
  * of exactness.
  */
object Bands {

  /** Index-shaped band rows from the raw `events` table:
    * (key = "event:"+type, off = epoch-seconds of the day, score = discrete
    * median of `value`, pct5..pct95 = discrete quantiles). */
  def deriveDaily(events: DataFrame): DataFrame = {
    val e = events.select(
      concat(lit("event:"), col("event_type")).as("key"),
      unix_timestamp(date_trunc("day", col("ts"))).as("off"),
      col("value"))
      // an absent (NULL) measure is not a rank candidate — and the two
      // engines DISAGREE on where unfiltered NULLs sort (Spark ASC ranks
      // them first, DuckDB last), so a NULL would silently shift every
      // quantile differently per engine (review finding, r19; the hdrGrid
      // NULL contract applied to the exact-band derivation)
      .filter(col("value").isNotNull)
    val grp = Window.partitionBy("key", "off")
    // row_number over equal values is tie-arbitrary, but the value AT a rank
    // in a sorted multiset is unique — every tie order picks the same value.
    val ranked = e
      .withColumn("rn", row_number().over(grp.orderBy("value")))
      .withColumn("n", count(lit(1)).over(grp))
    def pick(k: Int, name: String) =
      max(when(col("rn") === greatest(lit(1), expr(s"($k * n + 99) div 100")),
        col("value"))).as(name)
    ranked.groupBy("key", "off").agg(
      pick(50, "score"), pick(5, "pct5"), pick(25, "pct25"),
      pick(75, "pct75"), pick(95, "pct95"))
  }

  /** DuckDB mirror of `deriveDaily` over the `events` view. */
  val oracleSql: String =
    """WITH e AS (SELECT 'event:' || event_type AS key,
      |  CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS off, value FROM events
      |  WHERE value IS NOT NULL),
      |r AS (SELECT key, off, value,
      |  row_number() OVER (PARTITION BY key, off ORDER BY value) AS rn,
      |  count(*) OVER (PARTITION BY key, off) AS n FROM e)
      |SELECT key, off,
      |  max(CASE WHEN rn = greatest(1, (50*n+99)//100) THEN value END) AS score,
      |  max(CASE WHEN rn = greatest(1, (5*n+99)//100) THEN value END) AS pct5,
      |  max(CASE WHEN rn = greatest(1, (25*n+99)//100) THEN value END) AS pct25,
      |  max(CASE WHEN rn = greatest(1, (75*n+99)//100) THEN value END) AS pct75,
      |  max(CASE WHEN rn = greatest(1, (95*n+99)//100) THEN value END) AS pct95
      |FROM r GROUP BY key, off
      |""".stripMargin.replaceAll("\\s+", " ")
}
