package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.SpanDedup

/** Planted-fixture laws for the span-level exact-substring dedup: the
  * reported spans must be exactly the cross-document shared runs (merged,
  * inclusive token offsets), intra-document repetition alone must not
  * trigger (df counts DISTINCT docs), disjoint shared runs must stay
  * separate islands, and short docs must contribute nothing. */
class SpanDedupSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val W = SpanDedup.W

  private def spans(docs: Seq[(Long, String)]): Set[(Long, Int, Int)] =
    try SpanDedup.sharedSpans(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    finally graft.util.Caches.drain()

  test("a shared run is recovered exactly, merged across overlapping shingles") {
    // doc 1 = A(20) ++ X(10), doc 2 = B(20) ++ X(10) with A, B, X disjoint:
    // only shingles fully inside X are shared (boundary shingles mix A/B
    // tails), so each doc reports exactly the X region [20, 29]
    val a = (1 to 20).map(i => s"a$i")
    val b = (1 to 20).map(i => s"b$i")
    val x = (1 to 10).map(i => s"x$i")
    val got = spans(Seq((1L, (a ++ x).mkString(" ")), (2L, (b ++ x).mkString(" "))))
    assert(got == Set((1L, 20, 29), (2L, 20, 29)), s"got $got")
  }

  test("intra-document repetition alone is not a shared span (df is per doc)") {
    val x = (1 to 10).map(i => s"x$i")
    val mid = (1 to 12).map(i => s"m$i")
    val solo = (x ++ mid ++ x).mkString(" ")
    val other = (1 to 30).map(i => s"z$i").mkString(" ")
    assert(spans(Seq((1L, solo), (2L, other))).isEmpty)
  }

  test("disjoint shared runs stay separate islands") {
    // X and Y shared between the docs, separated by >W unshared tokens
    val x = (1 to 10).map(i => s"x$i")
    val y = (1 to 10).map(i => s"y$i")
    val m1 = (1 to 20).map(i => s"m$i")
    val m2 = (1 to 20).map(i => s"n$i")
    val got = spans(Seq(
      (1L, (x ++ m1 ++ y).mkString(" ")),
      (2L, (x ++ m2 ++ y).mkString(" "))))
    assert(got == Set((1L, 0, 9), (1L, 30, 39), (2L, 0, 9), (2L, 30, 39)),
      s"got $got")
  }

  test("docs shorter than the shingle width contribute nothing") {
    val x = (1 to W - 1).map(i => s"x$i").mkString(" ")
    assert(spans(Seq((1L, x), (2L, x))).isEmpty)
  }

  test("identical docs report one full-length span each") {
    val x = (1 to 25).map(i => s"x$i").mkString(" ")
    val got = spans(Seq((1L, x), (2L, x)))
    assert(got == Set((1L, 0, 24), (2L, 0, 24)), s"got $got")
  }

  test("sharedSpansFrom over a stored parquet sketch equals the inline path and never re-tokenizes") {
    val a = (1 to 20).map(i => s"a$i")
    val b = (1 to 20).map(i => s"b$i")
    val x = (1 to 10).map(i => s"x$i")
    val docSeq = Seq((1L, (a ++ x).mkString(" ")), (2L, (b ++ x).mkString(" ")))
    val docs = docSeq.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("span_sketch").toString
    try {
      SpanDedup.spanShingles(docs).write.mode("overwrite").parquet(tmp)
      val stored = SpanDedup.sharedSpansFrom(spark.read.parquet(tmp))
      // the whole point of the stored sketch: an analysis pass reads the
      // materialized (doc_id, pos, h) rows and never recomputes them
      val plan = stored.queryExecution.executedPlan.toString
      assert(!plan.contains("md5"), s"stored path recomputes shingle hashes:\n$plan")
      assert(!plan.contains("split("), s"stored path re-tokenizes text:\n$plan")
      val got = stored.collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == spans(docSeq), s"got $got")
    } finally {
      graft.ingest.Compact.rmTree(tmp)
      graft.util.Caches.drain()
    }
  }

  test("cutSharedSpans excises exactly the shared run, order preserved; untouched docs verbatim") {
    // doc 1 = A(20) ++ X(10) ++ C(12), doc 2 = B(20) ++ X(10): the shared
    // X region is cut from both; doc 1 keeps A then C in order, doc 2
    // keeps B; doc 3 shares nothing and must come back verbatim
    val a = (1 to 20).map(i => s"a$i")
    val b = (1 to 20).map(i => s"b$i")
    val c = (1 to 12).map(i => s"c$i")
    val x = (1 to 10).map(i => s"x$i")
    val solo = (1 to 30).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, (a ++ x ++ c).mkString(" ")),
      (2L, (b ++ x).mkString(" ")),
      (3L, solo)).toDF("doc_id", "text")
    try {
      val got = SpanDedup.cutSharedSpans(docs).collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      assert(got(1L) == (a ++ c).mkString(" "), s"doc 1: ${got(1L)}")
      assert(got(2L) == b.mkString(" "), s"doc 2: ${got(2L)}")
      assert(got(3L) == solo)
    } finally graft.util.Caches.drain()
  }

  test("keep-first cut: the canonical copy survives verbatim, later copies are excised") {
    // identical docs 1 and 2: every shared shingle's canonical occurrence
    // is in doc 1 (lowest doc_id), so doc 1 must pass through UNTOUCHED and
    // doc 2 must lose the whole run — the Lee et al. dedup policy, vs
    // cutSharedSpans which would empty both
    val x = (1 to 25).map(i => s"x$i").mkString(" ")
    val solo = (1 to 30).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, x), (2L, x), (3L, solo)).toDF("doc_id", "text")
    try {
      val got = SpanDedup.cutSharedSpansKeepFirst(docs).collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      assert(got(1L) == x, s"canonical copy was cut: ${got(1L)}")
      assert(got(2L) == "", s"duplicate copy survived: ${got(2L)}")
      assert(got(3L) == solo)
    } finally graft.util.Caches.drain()
  }

  test("keep-first cut marks within-document repeats beyond the first") {
    // doc 1 = X ++ M ++ X with M long enough to separate islands, doc 2 = X:
    // X is cross-document shared; its canonical occurrences are doc 1's
    // FIRST copy (pos < all others), so doc 1 keeps copy one, loses copy
    // two, and doc 2 (higher doc_id) loses its copy
    val x = (1 to 10).map(i => s"x$i")
    val m = (1 to 20).map(i => s"m$i")
    val docs = Seq(
      (1L, (x ++ m ++ x).mkString(" ")),
      (2L, x.mkString(" "))).toDF("doc_id", "text")
    try {
      val got = SpanDedup.cutSharedSpansKeepFirst(docs).collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      assert(got(1L) == (x ++ m).mkString(" "), s"doc 1: ${got(1L)}")
      assert(got(2L) == "", s"doc 2: ${got(2L)}")
    } finally graft.util.Caches.drain()
  }

  test("spanCoverage is the merged-island token fraction, 0 for untouched docs") {
    val a = (1 to 20).map(i => s"a$i")
    val b = (1 to 20).map(i => s"b$i")
    val x = (1 to 10).map(i => s"x$i")
    val docs = Seq(
      (1L, (a ++ x).mkString(" ")),   // 10 of 30 tokens shared
      (2L, (b ++ x).mkString(" ")),
      (3L, (1 to 25).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    try {
      val got = SpanDedup.spanCoverage(docs).collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(got(1L) == ((30, 10L, 0.3333)), s"doc 1: ${got(1L)}")
      assert(got(2L) == ((30, 10L, 0.3333)), s"doc 2: ${got(2L)}")
      assert(got(3L) == ((25, 0L, 0.0)), s"doc 3: ${got(3L)}")
    } finally graft.util.Caches.drain()
  }

  test("benchSpans marks only bench-shared runs; train-train repeats exempt") {
    // bench = doc 0 (id < benchMaxId=10); train docs 10-12:
    //  - doc 10 shares X with the BENCH doc          -> flagged [20, 29]
    //  - docs 11 & 12 share Y with EACH OTHER only   -> NOT flagged (the
    //    defining difference from sharedSpans, which would mark both)
    val a = (1 to 20).map(i => s"a$i")
    val b = (1 to 20).map(i => s"b$i")
    val x = (1 to 10).map(i => s"x$i")
    val y = (1 to 10).map(i => s"y$i")
    val docs = Seq(
      (0L, (a ++ x).mkString(" ")),
      (10L, (b ++ x).mkString(" ")),
      (11L, ((1 to 20).map(i => s"c$i") ++ y).mkString(" ")),
      (12L, ((1 to 20).map(i => s"d$i") ++ y).mkString(" ")))
      .toDF("doc_id", "text")
    try {
      val got = SpanDedup.benchSpansFrom(SpanDedup.spanShingles(docs), 10L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(got == Set((10L, 20, 29)), s"got $got")
      // the same corpus through sharedSpans DOES mark the train-train pair,
      // pinning that the two policies genuinely differ
      val shared = spans(Seq((0L, (a ++ x).mkString(" ")),
        (10L, (b ++ x).mkString(" ")),
        (11L, ((1 to 20).map(i => s"c$i") ++ y).mkString(" ")),
        (12L, ((1 to 20).map(i => s"d$i") ++ y).mkString(" "))))
      assert(shared.exists(_._1 == 11L) && shared.exists(_._1 == 12L))
    } finally graft.util.Caches.drain()
  }

  test("sourceOverlapFrom: shared shingles count once per source pair, " +
    "identical sources reach containment 1, disjoint pairs are absent") {
    val x = (1 to 20).map(i => s"x$i")   // shared between s0 and s1
    val a = (1 to 20).map(i => s"a$i")   // s0 only
    val z = (1 to 30).map(i => s"z$i")   // s2, disjoint from everything
    val docs = Seq(
      (0L, (a ++ x).mkString(" "), "s0"),
      (1L, x.mkString(" "), "s1"),
      (2L, x.mkString(" "), "s1"),       // duplicate doc: DISTINCT per source
      (3L, z.mkString(" "), "s2"))
      .map { case (id, t, s) => (id, t, "en", s, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    try {
      val sketch = SpanDedup.spanShingles(docs)
      val got = SpanDedup.sourceOverlapFrom(sketch, docs).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      // s1's sketch is exactly X's 13 shingles (|X|−W+1), all inside s0
      val nx = x.length - W + 1
      assert(got.keySet == Set(("s0", "s1")), s"got $got")
      val (shared, nA, nB, cont) = got(("s0", "s1"))
      assert(shared == nx && nB == nx, "duplicate doc must not double-count")
      assert(nA > nB && cont == 1.0,
        "s1 fully contained in s0 must read containment 1")
    } finally graft.util.Caches.drain()
  }
}
