package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series relational operators the reference's time-series mode implies
  * but Spark lacks as built-ins: as-of join, gap-fill/forward-fill resample,
  * and bounded date-range join. (Reference context: time-series tables keyed
  * by (key, offset-seconds) — src/ca-table.h:96-105, ca-dump.cc:332-400 —
  * are exactly the shape these operators consume downstream.)
  *
  * All three are formulated for the 100 TB case: each is a constant number of
  * hash shuffles on the series key (or bucket id), no broadcast of a big
  * side, no per-key cross-product, and everything between the exchanges
  * stays in whole-stage codegen.
  */
object TimeSeriesOps {

  /** As-of join: for every left row, attach the single latest right row of
    * the same `key` with `right.ts <= left.ts` (nulls when no such row).
    *
    * Implemented as a tagged UNION + one running-window scan per key — the
    * scale-correct distributed as-of: ONE hash exchange on `key`, a
    * per-partition sort on (ts, side), and a `last(..., ignoreNulls)` carry.
    * A join-based formulation (range theta-join, or equi-join + filter +
    * re-rank) expands O(|L|·|R|) per key before pruning and dies on skewed
    * keys; this one is linear in |L|+|R| per key.
    *
    * Right rows sorting at side 0 makes a right row with ts equal to a left
    * row's visible to it ("<=", not "<"). Ties between two RIGHT rows at the
    * same (key, ts) are resolved arbitrarily — pre-dedup the right side if
    * its (key, ts) is not unique.
    *
    * Output: all left columns, plus `r_ts` and `r_<c>` for each carry column.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               carry: Seq[String]): DataFrame = {
    // the right row carries as ONE struct, so the attached columns always
    // come from the SAME latest row — per-column last(ignoreNulls) carries
    // would stitch fields from different right rows whenever the latest
    // row holds a NULL carry value (review finding, r19: (r_ts, r_v)
    // combinations that exist in no right row)
    val rTagged = right
      .select(col(key), col(ts),
        struct(col(ts).as("r_ts") +:
          carry.map(c => col(c).as(s"r_$c")): _*).as("_r"))
      .withColumn("_side", lit(0))
    val lTagged = left.withColumn("_side", lit(1))
    val matched = "r_ts" +: carry.map(c => s"r_$c")
    val w = Window.partitionBy(key).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        matched.map(n => col(s"_r.$n").as(n)): _*)
  }

  /** Daily resample with forward fill: `series` (key, day: DateType, v) →
    * one row per key per calendar day between that key's min and max day;
    * days with no observation carry the previous day's value, flagged
    * `filled`. The grid explode is bounded by each key's own span (never a
    * global min–max cross-product), and both the bounds aggregate and the
    * fill window hash-partition on `key` alone, so the plan is two
    * exchanges regardless of data volume.
    */
  def gapFillDaily(series: DataFrame, key: String, day: String,
                   v: String): DataFrame = {
    val grid = series.groupBy(key)
      .agg(min(col(day)).as("_d0"), max(col(day)).as("_d1"))
      .select(col(key),
        explode(sequence(col("_d0"), col("_d1"), expr("interval 1 day")))
          .as(day))
    val w = Window.partitionBy(key).orderBy(day)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(series, Seq(key, day), "left")
      .withColumn("filled", col(v).isNull)
      .withColumn(v, last(col(v), ignoreNulls = true).over(w))
  }

  /** Trailing moving average over a daily series (key, dnum: epoch-day, v):
    * per key, the average of `days`-day trailing values by RANGE frame —
    * calendar-aware (a gap day shrinks the frame; a ROWS frame would
    * wrongly average the last N observations). One hash exchange on the
    * key; the frame scan is linear per key. */
  def movingAvgDaily(series: DataFrame, key: String, dnum: String, v: String,
                     days: Int): DataFrame = {
    val w = Window.partitionBy(key).orderBy(dnum)
      .rangeBetween(-(days - 1), Window.currentRow)
    series.select(col(key), col(dnum),
      round(avg(col(v)).over(w), 4).as(s"avg$days"))
  }

  /** Simple exponential smoothing (the classic one-step forecast state):
    * s₁ = x₁, sₜ = (xₜ + sₜ₋₁)/2 — α pinned to 1/2 so every update is an
    * IEEE-exact halving and the smoothed state is bit-identical across
    * engines with NO rounding mask (the integer-PageRank exactness idea
    * applied to a float recurrence). The recurrence is inherently
    * sequential PER KEY, so each key's (bounded) series folds inside one
    * row: collect + sort by day, then an ordered fold — per-key state
    * never crosses rows and keys stay parallel (the mapGroups shape as a
    * declarative aggregate; a 100 TB corpus has many keys, not long
    * keys). Returns (key, n_points, ewma). */
  def ewmaLast(series: DataFrame, key: String, dnum: String,
      v: String): DataFrame =
    series.groupBy(col(key))
      .agg(sort_array(collect_list(struct(col(dnum), col(v)))).as("pts"))
      .select(col(key), size(col("pts")).cast("long").as("n_points"),
        aggregate(col("pts"), lit(null).cast("double"),
          (s, p) => when(s.isNull, p.getField(v).cast("double"))
            .otherwise((p.getField(v).cast("double") + s) / 2)).as("ewma"))

  /** Per-point anomaly flags over a keyed daily series — the classic
    * z-score control chart: z = (x − mean)/σ against the key's OWN series
    * statistics, flagged when |z| exceeds `threshold`. The moments come
    * from EXACT integer sums (n, Σx, Σx² — order-invariant BIGINTs), so
    * mean = Σx/n and var = Σx²/n − mean² are ONE identical float
    * expression tree in both engines; the textbook Σ(x−mean)² form would
    * accumulate doubles in partition order and drift. greatest(var, 0)
    * absorbs the cancellation ulp a constant-ish series can produce; a
    * constant series (σ = 0) flags nothing and reports z = 0. One hash
    * exchange on the key; the stats window runs over the bounded daily
    * grid. `v` must be integer-typed (daily counts — exactness is the
    * contract). Returns (key, dnum, v, z, is_anomaly). */
  def zscoreDaily(series: DataFrame, key: String, dnum: String, v: String,
      threshold: Double = 2.0): DataFrame = {
    val byKey = Window.partitionBy(key)
    val mean = col("_s1").cast("double") / col("_n")
    val varr = greatest(
      col("_s2").cast("double") / col("_n") - mean * mean, lit(0.0))
    val sd = sqrt(varr)
    series
      .withColumn("_n", count(lit(1)).over(byKey))
      .withColumn("_s1", sum(col(v)).over(byKey))
      .withColumn("_s2", sum(col(v) * col(v)).over(byKey))
      .select(col(key), col(dnum), col(v),
        when(sd > 0.0, round((col(v) - mean) / sd, 4))
          .otherwise(lit(0.0)).as("z"),
        (sd > 0.0 && abs(col(v) - mean) > sd * threshold).as("is_anomaly"))
  }

  /** DAY-OF-WEEK seasonality profile over a per-key daily series — the
    * weekly-cycle decomposition read next to ts_anomaly (an anomaly gate
    * that ignores seasonality flags every weekend): per (key, dow) the
    * day count, event mass, and the seasonality index
    * (dow daily mean / overall daily mean; 1.0 = flat). The weekday is
    * PURE INTEGER arithmetic — pmod(dnum + 4, 7) with 0 = Sunday
    * (1970-01-01 was a Thursday) — so both engines agree with no
    * calendar-function convention risk (Spark dayofweek is 1-based
    * Sunday, DuckDB's is 0-based). The oracle renders the positive
    * modulus as ((x % 7) + 7) % 7: DuckDB's bare % follows the
    * dividend's sign and would diverge from pmod on pre-epoch days
    * (review finding, r19). Two partial-aggregating groupBys plus
    * a key-cardinality-sized broadcast join; output is |keys|×7 at any
    * volume. */
  def dowProfile(daily: DataFrame, key: String = "event_type",
      dnum: String = "dnum", v: String = "n"): DataFrame = {
    val prof = daily
      .groupBy(col(key), pmod(col(dnum) + 4, lit(7)).as("dow"))
      .agg(count(lit(1)).as("n_days"), sum(v).as("n_events"))
    val tot = prof.groupBy(key)
      .agg(sum("n_days").as("t_days"), sum("n_events").as("t_events"))
    prof.join(broadcast(tot), Seq(key))
      .select(col(key), col("dow"), col("n_days"), col("n_events"),
        round((col("n_events").cast("double") / col("n_days")) /
          (col("t_events").cast("double") / col("t_days")), 4)
          .as("seasonality"))
  }

  /** Date-range join via fixed-width bucketing: returns every (range row,
    * point row) pair with `startDay <= pDay < endDayExcl` (dates, end
    * exclusive). The non-equi BETWEEN predicate rides on an equi-join over
    * bucket ids: the RANGE side explodes into the O(span/width) buckets it
    * overlaps, while the (usually much larger) POINT side keeps exactly one
    * bucket per row — no point row is ever duplicated, and the shuffle is a
    * plain hash partition on the bucket id. This is the standard rewrite
    * that turns an O(|R|·|P|) theta-join (a broadcast-nested-loop in stock
    * Spark) into a co-partitioned equi-join; pick `bucketDays` near the
    * typical range span so ranges explode into ~2 buckets.
    */
  def rangeJoinDays(ranges: DataFrame, startDay: String, endDayExcl: String,
                    points: DataFrame, pDay: String,
                    bucketDays: Int = 7): DataFrame = {
    val rb = ranges.withColumn("_b",
      explode(sequence(
        floor(unix_date(col(startDay)) / bucketDays),
        floor((unix_date(col(endDayExcl)) - 1) / bucketDays))))
    val pb = points.withColumn("_b",
      floor(unix_date(col(pDay)) / bucketDays))
    rb.join(pb,
        rb("_b") === pb("_b") &&
          col(pDay) >= col(startDay) && col(pDay) < col(endDayExcl))
      .drop("_b")
  }
}
