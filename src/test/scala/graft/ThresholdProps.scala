package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ast.QueryStmt
import graft.exec.QueryExec
import graft.model.Tables
import graft.parser.Parser

/** Randomized pinning of the QUERY thresholds path (J7 + paging) against an
  * in-memory transcription of the reference loop: dedup-max the query and the
  * threshold key, keep offsets whose threshold score ∈ [min, max), REPLACE
  * the result score, rank by (score desc, off asc), slice the page, assign
  * buckets by scanning the sorted threshold list (query.cc:749-807,900-928).
  * Exercises duplicate offsets, boundary-equal scores, reversal (~), LIMIT/
  * OFFSET slices, and the single-threshold empty case across seeds. */
class ThresholdProps extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def model(
      q: Seq[(Long, Double)], thr: Seq[(Long, Double)],
      ts: List[Double], reversed: Boolean,
      limit: Long, offset: Long): Seq[(Long, Double, String)] = {
    val qMax = q.groupBy(_._1).view.mapValues(_.map(_._2).max)
    val tMax = thr.groupBy(_._1).view.mapValues(_.map(_._2).max)
    val sorted = ts.sorted
    if (sorted.size < 2) return Seq.empty
    val (lo, hi) = (sorted.head, sorted.last)
    val kept = qMax.keys.toSeq.flatMap { off =>
      tMax.get(off).filter(s => s >= lo && s < hi).map(s => (off, s))
    }
    val ranked = kept.sortBy { case (off, s) => (-s, off) }
    val page = ranked.slice(offset.toInt,
      if (limit < 0) ranked.size else (offset + limit).toInt)
    page.map { case (off, s) =>
      // bucket j: t(j) <= s < t(j+1); ordinal j+1, reversed → n-(j+1)
      val j = sorted.lastIndexWhere(_ <= s) match {
        case i if i == sorted.size - 1 => i - 1 // s == last is filtered; safe
        case i => i
      }
      val k = if (reversed) sorted.size - (j + 1) else j + 1
      (off, s, QueryExec.base26(k))
    }
  }

  test("thresholds + paging match the in-memory reference transcription") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 8) {
      val q = Seq.fill(30 + rnd.nextInt(40))(
        (rnd.nextInt(25).toLong, rnd.nextInt(12).toDouble))
      val thr = Seq.fill(30 + rnd.nextInt(40))(
        (rnd.nextInt(25).toLong, rnd.nextInt(12).toDouble))
      val nTs = 1 + rnd.nextInt(4)
      val ts = List.fill(nTs)(rnd.nextInt(12).toDouble).distinct.sorted
      val reversed = rnd.nextBoolean()
      val limit = if (rnd.nextBoolean()) -1L else rnd.nextInt(8).toLong
      val offset = if (limit < 0) 0L else rnd.nextInt(4).toLong

      val index = q.map { case (o, s) => ("q", o, s) } ++
        thr.map { case (o, s) => ("t", o, s) }
      val summaries = (0L to 24L).map(o => (o, s"d$o", "{}"))
      val t = Tables(index.toDF("key", "off", "score"),
        summaries.toDF("off", "key", "json"),
        Seq.empty[(String, String)].toDF("key", "json"))

      val key = if (reversed) "~t" else "t"
      val tsTxt = ts.map(_.toLong.toString).mkString(", ")
      val stmtTxt =
        s"QUERY 'q' THRESHOLDS $tsTxt FOR KEY '$key' LIMIT $limit OFFSET $offset;"
      val stmt = Parser.parseStatement(stmtTxt).asInstanceOf[QueryStmt]

      val got = QueryExec.page(spark, t, stmt).collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          if (r.length > 2) r.getString(3) else null))
      val want = model(q, thr, ts, reversed, limit, offset)

      if (ts.size < 2)
        assert(got.isEmpty, s"trial $trial: single threshold must be empty")
      else {
        // page CONTENT (incl. which rows survive the ranked LIMIT/OFFSET cut
        // — that pins the score-desc/off-asc ranking) and per-row bucket
        // keys; row ORDER is the presenter's re-sort, not the page's contract
        assert(got.toSet == want.toSet, s"trial $trial: $stmtTxt")
      }
    }
  }
}
