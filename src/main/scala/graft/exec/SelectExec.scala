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

  /** The joined pivot BEFORE the final projection — keeps `off` so callers
    * can pin the reference's offset iteration order (select.cc:133-152). */
  private def joined(spark: SparkSession, t: Tables, stmt: SelectStmt): DataFrame = {
    val c = new QueryCompiler(spark, t)
    val selection = dedupMin(c.compile(stmt.from).postings).select("off")

    stmt.fields.zipWithIndex.foldLeft(selection) {
      case (acc, (fq, i)) =>
        val name = s"f${i + 1}"
        val field = dedupMin(c.compile(fq).postings)
        // all_zero is a property of the ENTIRE field posting list, not the
        // matched subset (select.cc:47-53): compute it as a 1-row aggregate
        // and broadcast — no driver-side action, stays one lazy plan.
        val allZero = field.agg(
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
