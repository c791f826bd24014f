package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S10 — dump sinks (/root/reference/src/ca-dump.cc:74-216,332-400):
  * index-raw, summaries, keys-only, per-key counts, and time-series rendering,
  * with the regex key filter's prefix short-circuit.
  *
  * The reference derives a seek range from the regex via
  * RE2::PossibleMatchRange (ca-dump.cc:334-338); here the session-wide
  * optimizer rule `plans.RegexPrefixPushdown` derives the equivalent
  * StartsWith conjunct from the anchored rlike — that predicate reaches the
  * parquet scan (min/max + dictionary pruning on the sorted key files), and
  * the rlike only runs on the pruned remainder (PlanAuditSpec pins the
  * pushed filter). Same trick, Spark-shaped — and every rlike filter in the
  * session gets it, not just the dump path.
  */
object Dump {

  /** Literal prefix of an anchored regex ("^priority:[12].*" → "priority:").
    * Delegates to the optimizer rule's (quantifier-safe) extractor. */
  def literalPrefix(re: String): Option[String] =
    graft.plans.RegexPrefixPushdown.literalPrefix(re)

  /** Percentile-band pass-through: the reference renders
    * `score pct5 pct25 pct75 pct95` when a posting has bands
    * (ca-dump.cc:168-199, HasPercentiles) — kept as columns here when the
    * source table carries them. */
  private def pctCols(df: DataFrame): Seq[Column] =
    Seq("pct5", "pct25", "pct75", "pct95")
      .filter(df.columns.contains).map(col)

  /** index-raw dump rows matching a key regex (ca-dump.cc:140-216). The
    * plain rlike is enough — RegexPrefixPushdown injects the pushable
    * prefix conjunct at optimization time. */
  def indexRaw(index: DataFrame, keyRegex: String): DataFrame =
    index.filter(col("key").rlike(keyRegex))
      .select(Seq(col("key"), col("off"), col("score")) ++ pctCols(index): _*)

  /** summaries dump (ca-dump.cc:74-110). */
  def summaries(summ: DataFrame): DataFrame = summ.select("key", "json")

  /** keys-only dump (ca-dump --keys-only). */
  def keys(summ: DataFrame): DataFrame = summ.select("key")

  /** per-key posting counts (A8, ca-dump.cc:163-165,340-367). */
  def counts(index: DataFrame): DataFrame =
    index.groupBy("key").agg(count(lit(1)).as("cnt"))

  /** time-series dump: offsets are epoch seconds, rendered with the
    * configured time format (ca-dump.cc:148-216, default
    * "%Y-%m-%d %H:%M:%S"). */
  def timeSeries(postings: DataFrame,
      fmt: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    postings.select(Seq(col("key"),
      date_format(timestamp_seconds(col("off")), fmt).as("t"),
      col("score")) ++ pctCols(postings): _*)
}
