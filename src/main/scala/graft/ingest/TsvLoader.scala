package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** S7 — TSV ingest (/root/reference/src/ca-load.cc:116-391): lines of
  * `key TAB (dockey|date) TAB value [TAB pct5 TAB pct25 TAB pct75 TAB pct95]`
  * with backslash escaping of tab/newline/CR inside fields.
  *
  *  - index mode: the middle column is a document key, resolved to its
  *    summary-table offset (ca-load.cc:282-294)
  *  - time-series mode: the middle column is a date string parsed with the
  *    given format; the offset is its epoch-SECONDS value
  *    (ca-load.cc:296-314; SURVEY §1.1 — time series store timestamps as
  *    offsets)
  *
  * Spark shape: a raw-line read + split, not the csv reader — the reference's
  * escaping (`\t` inside a field) is not CSV quoting. The unescape is the one
  * procedural per-char step (a transcription of ca-load.cc:238-253) and runs
  * once at ingest, never at query time.
  */
object TsvLoader {

  /** Unescape \t \n \r \\ (ca-load.cc:238-253: backslash followed by
    * t/n/r/other — other keeps the char). */
  def unescape(s: String): String = {
    if (s == null || !s.contains('\\')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb.append('\t')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case o => sb.append(o)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private val unescapeUdf = udf(unescape _)

  /** `escape` as a column — fixture writers reuse it so the TSV they plant
    * goes through the same escaping contract the loader undoes. */
  val escapeUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf(escape _)

  /** C2 — the inverse escape for TSV output (format.cc:247-268: tab, newline,
    * CR and backslash become backslash sequences). */
  def escape(s: String): String = {
    if (s == null) return null
    val sb = new StringBuilder(s.length)
    for (c <- s) c match {
      case '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\\' => sb.append("\\\\")
      case o => sb.append(o)
    }
    sb.toString
  }

  /** Raw 3+-column split of a TSV file: (key, mid, value, pct5..pct95). */
  private def rawColumns(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    val parts = split(col("value"), "\t")
    // `get` (not getItem) — the percentile columns are optional and ANSI mode
    // rejects out-of-bounds getItem.
    lines.select(
      unescapeUdf(get(parts, lit(0))).as("key"),
      unescapeUdf(get(parts, lit(1))).as("mid"),
      get(parts, lit(2)).cast("double").as("score"),
      get(parts, lit(3)).cast("double").as("pct5"),
      get(parts, lit(4)).cast("double").as("pct25"),
      get(parts, lit(5)).cast("double").as("pct75"),
      get(parts, lit(6)).cast("double").as("pct95"))
  }

  /** Index mode: resolve document keys against the summary table
    * (ca-load.cc:282-294 — unknown doc keys are an error there; here they are
    * dropped by the inner join and surfaced by the caller comparing counts). */
  def loadIndex(spark: SparkSession, path: String, summaries: DataFrame): DataFrame =
    rawColumns(spark, path)
      .join(summaries.select(col("key").as("mid"), col("off")), Seq("mid"))
      .select("key", "off", "score", "pct5", "pct25", "pct75", "pct95")

  /** Time-series mode: parse the date column; offset := epoch seconds
    * (ca-load.cc:296-314, default format "%Y-%m-%d %H:%M:%S"). */
  def loadTimeSeries(spark: SparkSession, path: String,
      format: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    rawColumns(spark, path)
      .select(col("key"),
        unix_timestamp(to_timestamp(col("mid"), format)).as("off"),
        col("score"), col("pct5"), col("pct25"), col("pct75"), col("pct95"))

  /** Summary mode: (key, json) pairs (ca-load.cc summary output type). */
  def loadSummaries(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    val parts = split(col("value"), "\t")
    // `get` like rawColumns — ANSI rejects out-of-bounds getItem, so a
    // malformed line (no tab) must read as a NULL json field, not a task
    // failure (review finding, r19: this was the one loader left on
    // getItem, and it had no caller exercising it)
    lines.select(
      unescapeUdf(get(parts, lit(0))).as("key"),
      unescapeUdf(get(parts, lit(1))).as("json"))
  }
}
