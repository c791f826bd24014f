package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.{CorpusOps, Selection, TextAnalysis}

class SelectionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** documents-shaped frame: target source src0 uses vocabulary A, the
    * rest vocabulary B — DSIR must rank every src0 doc above every other. */
  private def docs(n: Int) = (0 until n).map { i =>
    val src = s"src${i % 4}"
    val words =
      if (src == "src0") Seq("alpha", "beta", "gamma", "delta")
      else Seq("omega", "sigma", "kappa", "lambda")
    val text = (0 until 12).map(j => words((i + j) % words.size)).mkString(" ")
    (i.toLong, text, "en", src, text.length.toLong)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("dsirWeights separates target-vocabulary docs from the rest") {
    val w = Selection.dsirWeights(docs(40), "src0").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val (tgt, rest) = w.partition(_._1 % 4 == 0)
    assert(tgt.nonEmpty && rest.nonEmpty)
    assert(tgt.values.min > rest.values.max,
      s"every src0 doc must outscore every non-src0 doc: $w")
    // importance weights are log-ratios: target-like > 0, alien < 0
    assert(tgt.values.forall(_ > 0) && rest.values.forall(_ < 0))
  }

  test("dsirSelect takes the top-k boundary on (score DESC, doc_id)") {
    val sel = Selection.dsirSelect(docs(40), "src0", 7).collect()
    assert(sel.length == 7)
    val scores = sel.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    // with 10 src0 docs all scoring above the rest, the cut stays inside
    // the target slice and ties broke by doc_id ascending
    assert(sel.map(_.getLong(0)).forall(_ % 4 == 0))
    assert(sel.map(_.getLong(0)).toSeq == sel.map(_.getLong(0)).toSeq.sorted)
  }

  test("linearQuality is a [0,1] score, equal for equal texts") {
    val d = Seq(
      (1L, "a b c a", "en", "s", 7L),
      (2L, "a b c a", "en", "s", 7L),
      (3L, "x y z w q", "en", "s", 9L)).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val q = Selection.linearQuality(d, 0.5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(q(1L) == q(2L), "same text must hash to the same score")
  }

  test("paretoSample keeps exactly the docs whose md5 uniform clears the " +
      "α=1 inverse-CDF threshold") {
    val d = docs(60)
    val scores = Selection.linearQuality(d, 0.0).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = scores.filter { case (id, s) =>
      val u = java.lang.Long.parseLong(
        md5hex(s"par:$id").substring(0, 6), 16) / 16777216.0
      u > (1.0 - s) / (2.0 - s)
    }.keySet
    val kept = Selection.paretoSampleLive(d).collect().map(_.getLong(0)).toSet
    assert(kept == expected)
    // the lottery must be a real filter with tail mass: some docs die,
    // some survive
    assert(kept.nonEmpty && kept.size < scores.size)
  }

  test("trainEvalSplit is a stable md5 partition (growth never moves a doc)") {
    val small = Selection.trainEvalSplit(docs(30)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val grown = Selection.trainEvalSplit(docs(120)).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(small.forall { case (id, sp) => grown(id) == sp },
      "a doc's split must not change when the corpus grows")
    assert(grown.values.toSet == Set("train", "val", "test"))
    // 12/2/2 hex-char buckets ⇒ train is the large majority
    val frac = grown.values.count(_ == "train").toDouble / grown.size
    assert(frac > 0.55 && frac < 0.92, s"train fraction $frac")
  }

  test("tokenBudgetSample fills each source greedily: starts under budget, " +
      "overflows by at most the last doc") {
    val budget = 50L
    val d = docs(60)
    val sel = CorpusOps.tokenBudgetSample(d, budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(sel.nonEmpty)
    sel.groupBy(_._2).foreach { case (src, rows) =>
      val total = rows.map(_._3).sum
      val maxDoc = rows.map(_._3).max
      assert(total - maxDoc < budget,
        s"$src: all but the overflow doc must fit: total=$total")
      // the draw is the md5-order PREFIX: every kept doc hashes before
      // every dropped doc of the same source
      val keptKeys = rows.map(r => (md5hex(s"bud:${r._1}"), r._1)).toSet
      val allKeys = d.filter(col("source") === src).collect()
        .map(r => (md5hex(s"bud:${r.getLong(0)}"), r.getLong(0))).sorted
      assert(allKeys.take(rows.size).toSet == keptKeys,
        s"$src: selection must be the md5-order prefix")
    }
  }

  test("urlDedup keeps min doc_id per normalized URL and counts every copy") {
    val planted = TextAnalysis.urlDedup(docs(100), every = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(planted.nonEmpty)
    // normalization folded case and stripped queries: hosts are lowercase,
    // no '?' survives
    assert(planted.forall { case (u, _, _) =>
      u == u.toLowerCase && !u.contains("?") })
    // every 5th doc of 100 planted one URL; group keys are (id%7, id%3)
    assert(planted.map(_._3).sum == (0 until 100).count(_ % 5 == 0))
    planted.foreach { case (u, keep, _) =>
      val members = (0 until 100).filter(i => i % 5 == 0 &&
        s"site${i % 7}.example/path${i % 3}" == u).map(_.toLong)
      assert(members.min == keep, s"$u keep_id must be min member")
    }
  }

  test("stored selection serving: sidecar == fresh scores, stored ratio == " +
      "live DSIR, and the serving statements never scan corpus text") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.model.Catalog.documents(spark, dir)
    // the materialized sidecar must equal the fresh projection row-for-row
    val stored = graft.model.Catalog.docScores(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getString(4))).toMap
    val fresh = Selection.scoreRows(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3), r.getString(4))).toMap
    assert(stored == fresh)
    // stored ratio table == live derivation, bit-for-bit (deterministic
    // ln-of-integer-ratio doubles)
    val rs = graft.model.Catalog.dsirRatio(spark, dir, "src0")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val rl = Selection.ratioTable(docs, "src0")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rs == rl)
    // serving statements are sidecar-only: no corpus text scan in any
    for (name <- Seq("quality_stored", "pipeline_curate", "sample_pareto")) {
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!TestSpark.scansCorpusText(p),
        s"$name must read the sidecar, not the corpus:\n$p")
    }
    graft.util.Caches.drain()
  }

  test("pplBuckets cuts balanced terciles with head outscoring tail") {
    val b = CorpusOps.pplBuckets(docs(48)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    b.groupBy(_._2).foreach { case (src, rows) =>
      val sizes = rows.groupBy(_._4).view.mapValues(_.size)
      assert(sizes.keySet == Set("head", "middle", "tail"))
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$src: ntile terciles must be balanced: $sizes")
      val head = rows.filter(_._4 == "head").map(_._3)
      val tail = rows.filter(_._4 == "tail").map(_._3)
      assert(head.min >= tail.max,
        s"$src: every head score must be >= every tail score")
    }
  }

  test("corpusReport composes: splits partition each source's docs") {
    val dir = "/root/testdata/sf0.001"
    val rep = Selection.corpusReport(
      graft.model.Catalog.docScores(spark, dir)).collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      assert(r.getLong(1) == r.getLong(4) + r.getLong(5) + r.getLong(6),
        s"${r.getString(0)}: n_docs must equal n_train+n_val+n_test")
      val mean = r.getDouble(3)
      assert(mean >= 0.0 && mean <= 1.0)
    }
    graft.util.Caches.drain()
  }

  test("distinctNgramDiversity is a (0,1] ratio per source") {
    val d = CorpusOps.distinctNgramDiversity(docs(40)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(d.nonEmpty)
    d.foreach { case (src, nd, nt, div) =>
      assert(nd <= nt && div > 0.0 && div <= 1.0, s"$src: $nd/$nt=$div")
      assert(div == BigDecimal(nd.toDouble / nt)
        .setScale(6, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
    }
  }

  test("domainCap bounds every domain at the cap, drawn in md5 order") {
    val cap = 2
    val rows = TextAnalysis.domainCap(docs(100), every = 5, cap = cap)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (dom, ds) =>
      assert(ds.size <= cap, s"$dom exceeded cap: ${ds.size}")
      // kept = first `cap` members in md5('cap:'||id) order
      val members = (0 until 100).filter(i => i % 5 == 0 &&
        s"site${i % 7}.example" == dom).map(_.toLong)
      val expect = members.sortBy(id => (md5hex(s"cap:$id"), id)).take(cap)
      assert(ds.map(_._1).sorted.toSeq == expect.sorted)
    }
  }

  test("curriculum stacks the breadth draw and the quality-gated anneal") {
    val d = docs(60)
    val sc = Selection.scoreRows(d)
    val cur = Selection.curriculum(d, sc, 20, 0.0, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val pre = cur.filter(_._1 == "pretrain").map(r => (r._2, r._3)).toSet
    val ann = cur.filter(_._1 == "anneal").map(r => (r._2, r._3)).toSet
    // each phase equals its standalone draw -- the schedule composes, it
    // does not re-derive
    val wantPre = CorpusOps.temperatureSample(d, 0.5, 20).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val wantAnn = Selection.curate(sc, 0.0, 10).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pre == wantPre && ann == wantAnn)
    assert(cur.length == pre.size + ann.size)
  }
}
