package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document repeated-SPAN detection — the span-level exact-substring
  * member of the dedup family (Lee et al. 2022, "Deduplicating Training
  * Data Makes Language Models Better"): long verbatim repeats across
  * documents are boilerplate, licenses, and templates that document-level
  * near-dup never catches, because the containing documents differ. The
  * reference engine has no span operator (its dedup surface is the
  * key-level J6/A1/A2 family); this is pipeline-beyond-reference surface
  * like the rest of ml/.
  *
  * A `W`-token rolling shingle is hashed at every position; shingles
  * occurring in MORE THAN ONE document are "shared", and each document's
  * shared positions merge into maximal token spans (gaps-and-islands over
  * the position sequence). Output is span-surgery input: (doc_id,
  * span_start, span_end) in 0-based token offsets, inclusive — ready for a
  * downstream cut or keep-first policy, which is a separate editorial
  * decision this operator deliberately does not bake in.
  *
  * Scale shape: the corpus expands to ~n_tokens shingle rows per doc (the
  * same fan-out every shingle op in NearDup pays), ONE hash aggregation on
  * the shingle hash computes the document frequency (count(distinct doc) >
  * 1 partial-aggregates map-side, so a boilerplate shingle present in
  * every document is not a hot key), and the island merge is a per-doc
  * window bounded by document length — no all-pairs stage, no driver
  * state. At 100 TB the shingle hash is the shuffle key.
  */
object SpanDedup {

  val W = 8 // span shingle width in tokens

  private def toks: Column = split(col("text"), " ")

  /** (doc_id, pos, h): the md5 of the W-token shingle at every 0-based
    * position; docs shorter than W contribute nothing. The position list is
    * guarded BEFORE sequence() — sequence(0, n−W) with n<W would generate a
    * DESCENDING range, not an empty one. */
  private def shingleHashes(docs: DataFrame): DataFrame = {
    val n = size(toks)
    docs.select(col("doc_id"), toks.as("tok"),
        when(n >= W, sequence(lit(0), n - W))
          .otherwise(array().cast("array<int>")).as("ps"))
      .select(col("doc_id"), col("tok"), explode(col("ps")).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(concat_ws(" ", slice(col("tok"), col("pos") + 1, lit(W)))).as("h"))
  }

  /** Maximal repeated spans: positions whose shingle appears in >1 distinct
    * document, merged per doc wherever consecutive spans overlap or touch
    * (next.pos ≤ prev.pos + W). Returns (doc_id, span_start, span_end),
    * token offsets inclusive. */
  def sharedSpans(docs: DataFrame): DataFrame = {
    val sh = shingleHashes(docs)
    val shared = sh.groupBy("h")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") > 1)
      .select("h")
    val pos = sh.join(shared, Seq("h")).select("doc_id", "pos")
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    pos
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byPos) <= W, lit(0))
          .otherwise(lit(1)))
      .withColumn("island", sum("brk").over(
        byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "island")
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(W) - 1).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** DuckDB mirror of sharedSpans: the same positional shingle hash (list
    * slice is 1-based inclusive, so tok[i+1 : i+W] is the Spark
    * slice(tok, pos+1, W) at pos = i), the same df > 1 gate, the same
    * lag-based island break with NULL-first-row → new island, and the same
    * inclusive span arithmetic; positions cast to INT to match Spark's
    * sequence element type. */
  def spansOracleSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tok
       |  FROM documents WHERE len(string_split(text, ' ')) >= $W),
       |p AS (SELECT doc_id, u.pos AS pos, u.h AS h FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, len(tok) - $W + 1),
       |    i -> {'pos': CAST(i AS INT),
       |          'h': md5(array_to_string(tok[i + 1 : i + $W], ' '))})) AS u
       |  FROM t)),
       |shared AS (SELECT h FROM p GROUP BY h HAVING count(DISTINCT doc_id) > 1),
       |sp AS (SELECT doc_id, pos FROM p JOIN shared USING (h)),
       |brk AS (SELECT doc_id, pos,
       |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= $W
       |         THEN 0 ELSE 1 END AS brk FROM sp),
       |isl AS (SELECT doc_id, pos, sum(brk) OVER (PARTITION BY doc_id
       |    ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM brk)
       |SELECT doc_id, min(pos) AS span_start,
       |  CAST(max(pos) + $W - 1 AS INT) AS span_end
       |FROM isl GROUP BY doc_id, island
       |""".stripMargin.replaceAll("\\s+", " ")
}
