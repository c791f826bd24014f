package graft.exec

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
import graft.ast._
import graft.compiler.{Compiled, QueryCompiler}
import graft.functions.{Funcs, Keywords}
import graft.model.Tables
import graft.operators.PostingAlgebra._
import graft.parser.Printer

/** Executes a parsed QUERY statement end-to-end — the Spark re-expression of
  * ca_schema_query (/root/reference/src/query.cc:726-948): compile the AST,
  * final dedup (max), threshold join with score replacement, top-K paging,
  * bucket-header synthesis, keys-only or summary+override fetch. The JSON
  * envelope lives in Presenter.
  */
object QueryExec {

  /** One threshold bucket [lo, hi) with its display header and sortable
    * base-26 key — all derived from the CONSTANT threshold list at plan time
    * (query.cc:900-928), so bucket assignment is the only data-dependent step.
    */
  final case class Bucket(lo: Double, hi: Double, header: String, headerKey: String)

  /** Build the bucket table for a sorted threshold list. Bucket ordinal k for
    * [t(j), t(j+1)) is j+1 (the reference's `i - thresholds.begin()` where i
    * points at the upper bound, query.cc:905-918); a leading '~' on the key
    * reverses ordinals (k := n - k). Timestamped keys render date headers:
    * "A–B", or just "A" when the bucket spans exactly one day. */
  def buckets(sorted: List[Double], reversed: Boolean, dateHeaders: Boolean): Seq[Bucket] =
    // A single threshold means [t, t) — always empty (query.cc:775-776).
    sorted.zip(sorted.drop(1)).zipWithIndex.map { case ((lo, hi), j) =>
      val header =
        if (!dateHeaders) s"${Printer.g9(lo)}–${Printer.g9(hi)}"
        else if (lo + 1 != hi) s"${daysToDate(lo)}–${daysToDate(hi)}"
        else daysToDate(lo)
      val k = if (reversed) sorted.size - (j + 1) else j + 1
      Bucket(lo, hi, header, base26(k))
    }

  /** "%B %e, %Y" with the double-space collapse (query.cc:158-169) — Java's
    * MMMM d pattern produces the collapsed form directly. Days since epoch. */
  def daysToDate(days: Double): String =
    java.time.LocalDate.ofEpochDay(days.toLong)
      .format(java.time.format.DateTimeFormatter.ofPattern("MMMM d, yyyy",
        java.util.Locale.US))

  /** Base-26 5-char sortable key "AAAAA".."ZZZZZ" (query.cc:923-927). */
  def base26(k: Long): String =
    (4 to 0 by -1).map(p => ('A' + (k / math.pow(26, p).toLong) % 26).toChar).mkString

  /** The threshold plan for a statement: the stripped key name, whether
    * reversed, and the bucket table. */
  private def thresholdPlan(th: Thresholds): (String, Seq[Bucket]) = {
    val (key, reversed) =
      if (th.key.startsWith("~")) (th.key.drop(1), true) else (th.key, false)
    val sorted = th.values.sorted
    (key, buckets(sorted, reversed, Keywords.isTimestamped(key)))
  }

  /** The deduped, threshold-filtered result set (off, score) BEFORE paging —
    * `offsets` right before the partial_sort (query.cc:726-793). With
    * thresholds, the result score is REPLACED by the threshold key's score and
    * only offsets whose threshold score ∈ [min, max) survive (query.cc:764-793).
    */
  def results(spark: SparkSession, t: Tables, stmt: QueryStmt): (DataFrame, Compiled) = {
    val compiled = new QueryCompiler(spark, t).compile(stmt.query)
    val deduped = dedupMax(compiled.postings)
    val res = stmt.thresholds match {
      case None => deduped
      case Some(th) if thresholdPlan(th)._2.isEmpty =>
        deduped.limit(0) // single threshold value: [t, t) is empty
      case Some(th) =>
        val (key, bs) = thresholdPlan(th)
        val (lo, hi) = (bs.head.lo, bs.last.hi)
        // Pin the threshold postings to one score per offset (max) — the
        // reference walks raw posting duplicates (query.cc:764-790); on a
        // well-formed index the two agree, and sets are the only
        // order-independent contract at scale.
        val thr = dedupMax(t.index.filter(col("key") === key).select("off", "score"))
        deduped.select("off")
          .join(thr.filter(col("score") >= lo && col("score") < hi), Seq("off"))
    }
    (res, compiled)
  }

  /** The ranked page (off, score [, _header, _header_key]) — partial_sort by
    * score desc + [OFFSET, OFFSET+LIMIT) slice, then bucket-header attachment
    * for threshold queries. The bucket table is tiny and broadcast; the range
    * join is a ≤#buckets-row nested-loop against the page only. */
  def page(spark: SparkSession, t: Tables, stmt: QueryStmt): DataFrame = {
    val (res, _) = results(spark, t, stmt)
    val pg = topK(res, stmt.limit, stmt.offset)
    stmt.thresholds match {
      case None => pg
      case Some(th) =>
        val (_, bs) = thresholdPlan(th)
        val bdf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            bs.map(b => Row(b.lo, b.hi, b.header, b.headerKey)), 1),
          StructType(Seq(
            StructField("lo", DoubleType), StructField("hi", DoubleType),
            StructField("_header", StringType), StructField("_header_key", StringType))))
        pg.join(broadcast(bdf),
            pg("score") >= bdf("lo") && pg("score") < bdf("hi"), "inner")
          .select(pg("off"), pg("score"), bdf("_header"), bdf("_header_key"))
    }
  }

  /** Full result rows: page + `_key` + summary JSON with the override overlay
    * (S6, query.cc:877-890) and S4 extra headers (query.cc:892-898) applied.
    * Columns: off, score, key, json [, _header, _header_key]. */
  /** The page is LIMIT-bounded — broadcast it into the summary join so a
    * small page never shuffles the (much larger) summary table. */
  private def pageHint(pg: DataFrame, stmt: QueryStmt): DataFrame =
    if (stmt.limit >= 0 && stmt.limit + stmt.offset <= 100000) broadcast(pg)
    else pg

  def rows(spark: SparkSession, t: Tables, stmt: QueryStmt): DataFrame = {
    val (res, compiled) = results(spark, t, stmt)
    rowsFrom(spark, t, stmt, res, compiled)
  }

  /** rows() on an ALREADY-BUILT results() pair — lets the presenter derive
    * `result-count` and the page from ONE cached result set instead of
    * evaluating the query twice (VERDICT r4 #6; the reference materializes
    * `offsets` once, query.cc:726-807). */
  private[graft] def rowsFrom(spark: SparkSession, t: Tables, stmt: QueryStmt,
      res: DataFrame, compiled: graft.compiler.Compiled): DataFrame = {
    val pg = pageHint(topK(res, stmt.limit, stmt.offset), stmt)
    val withSumm = pg.join(t.summaries, Seq("off"), "inner")
    val ovr = t.overrides.withColumnRenamed("json", "ovr_json")
    var out = withSumm.join(ovr, Seq("key"), "left_outer")
      .select(Seq(col("off"), col("score"), col("key"),
        when(col("ovr_json").isNotNull, Funcs.jsonMerge(col("json"), col("ovr_json")))
          .otherwise(col("json")).as("json")) ++
        pctCols(pg).map(col): _*)
    compiled.extra.foreach { e =>
      out = out.join(e, Seq("off"), "left_outer")
    }
    stmt.thresholds match {
      case None => out
      // Single threshold value: [t, t) is empty — results() already limited
      // the page to 0 rows; attach null header columns so the schema matches
      // the populated-thresholds shape instead of crashing on bs.head
      // (ADVICE r3; query.cc:775-776).
      case Some(th) if thresholdPlan(th)._2.isEmpty =>
        out.withColumn("_header", lit(null).cast(StringType))
          .withColumn("_header_key", lit(null).cast(StringType))
      case Some(th) =>
        val (_, bs) = thresholdPlan(th)
        val whenChain = bs.tail.foldLeft(
          when(col("score") < bs.head.hi, bs.head.header)) { (acc, b) =>
          acc.when(col("score") < b.hi, b.header)
        }
        val keyChain = bs.tail.foldLeft(
          when(col("score") < bs.head.hi, bs.head.headerKey)) { (acc, b) =>
          acc.when(col("score") < b.hi, b.headerKey)
        }
        out.withColumn("_header", whenChain).withColumn("_header_key", keyChain)
    }
  }

  /** KEYS FOR — the page's document keys in rank order (query.cc:809-828). */
  /** The page's document keys IN RANK ORDER (query.cc:809-828) — sorted
    * here, not left to the consumer: the summaries join destroys the topK
    * order, so an unsorted select would return partition-dependent order
    * in breach of this contract (review finding, r19; Presenter.queryKeys
    * applies the same (score DESC, off) order). */
  def keys(spark: SparkSession, t: Tables, stmt: QueryStmt): DataFrame =
    keysRanked(spark, t, stmt)
      .orderBy(org.apache.spark.sql.functions.desc("score"),
        org.apache.spark.sql.functions.asc("off"))
      .select("key")

  /** Keys with their rank columns (the join does not preserve order; the
    * presenter re-sorts by them — query.cc:809-828 prints in rank order). */
  def keysRanked(spark: SparkSession, t: Tables, stmt: QueryStmt): DataFrame = {
    val (res, _) = results(spark, t, stmt)
    pageHint(topK(res, stmt.limit, stmt.offset), stmt)
      .join(t.summaries, Seq("off"), "inner")
      .select("off", "score", "key")
  }

  /** Total match count before paging — the envelope's "result-count"
    * (query.cc:933). */
  def resultCount(spark: SparkSession, t: Tables, stmt: QueryStmt): Long =
    results(spark, t, stmt)._1.count()

  /** Convenience: parse a statement string and return the page / keys /
    * rows DataFrame for it (the driver CORRECTNESS entry points — these go
    * text → lexer → parser → compiler → executor). */
  def runPage(spark: SparkSession, t: Tables, text: String): DataFrame =
    graft.parser.Parser.parseStatement(text) match {
      case q: QueryStmt if q.keysOnly => keys(spark, t, q)
      case q: QueryStmt => page(spark, t, q)
      case s => throw new IllegalArgumentException(s"not a QUERY statement: $s")
    }

  def runRows(spark: SparkSession, t: Tables, text: String): DataFrame =
    graft.parser.Parser.parseStatement(text) match {
      case q: QueryStmt => rows(spark, t, q)
      case s => throw new IllegalArgumentException(s"not a QUERY statement: $s")
    }
}
