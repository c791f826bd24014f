package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Bpe

class BpeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def docs(rows: Seq[String]) = rows.zipWithIndex.map {
    case (t, i) => (i.toLong, t, "en", "s0", t.length.toLong)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("train matches the plain-Scala Sennrich reference exactly") {
    val d = docs(Seq(
      "low low low lower lowest",
      "new newer newest low",
      "wide wider widest new new"))
    val wc = d.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Bpe.referenceTrain(wc, 8)
    val got = Bpe.train(d, 8)
    assert(got == want,
      s"learned merges must be bit-identical to the reference\n$got\n$want")
  }

  private def tok(ts: String*): String = ts.mkString(Bpe.Sep)

  test("foldMerge is the leftmost-nonoverlapping scan") {
    // (a,a,a) under merge (a,a): leftmost pair fuses -> (aa, a);
    // (a,a,a,a) -> (aa, aa) -- the overlap cases the fold must get right
    val df = Seq(tok("a", "a", "a"), tok("a", "a", "a", "a"), tok("b", "a"))
      .toDF("toks")
      .select(Bpe.foldMerge(col("toks"), "a", "a").as("m"))
    assert(df.as[String].collect().toSeq ==
      Seq(tok("aa", "a"), tok("aa", "aa"), tok("b", "a")))
  }

  test("merged tokens do not re-match their raw parts") {
    // after (a,b)->ab, the pair (b,c) must not fire on the b inside ab
    val df = Seq(tok("a", "b", "c")).toDF("toks")
      .select(Bpe.foldMerge(Bpe.foldMerge(col("toks"), "a", "b"), "b", "c")
        .as("m"))
    assert(df.as[String].collect().head == tok("ab", "c"))
  }

  test("encodeVocab applies the full merge chain per distinct word") {
    val d = docs(Seq("banana bandana", "banana"))
    val merges = Bpe.train(d, 4).map(m => (m._2, m._3))
    val enc = Bpe.encodeVocab(d, merges).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(enc.keySet == Set("banana", "bandana"))
    // n_sub is the token count of the space-joined rendering
    enc.values.foreach { case (e, n) =>
      assert(e.split(" ").length.toLong == n)
    }
    // the end-of-word marker survives encoding (possibly fused)
    enc.values.foreach { case (e, _) => assert(e.contains("</w>")) }
  }

  test("docTokens equals the sum of per-word encoded lengths") {
    val d = docs(Seq("low low new", "wide new"))
    val merges = Bpe.train(d, 3).map(m => (m._2, m._3))
    val vocab = Bpe.encodeVocab(d, merges).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val got = Bpe.docTokens(d, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      0L -> (2 * vocab("low") + vocab("new")),
      1L -> (vocab("wide") + vocab("new")))
    assert(got == want)
  }

  test("vocab frequency mass equals the corpus BPE token count") {
    val d = docs(Seq("low low new", "wide new lowest", "low wide wide"))
    val merges = Bpe.train(d, 5).map(m => (m._2, m._3))
    val vocabMass = Bpe.vocab(d, merges)
      .agg(sum("freq")).collect().head.getLong(0)
    val docMass = Bpe.docTokens(d, merges)
      .agg(sum("n_tok_bpe")).collect().head.getLong(0)
    assert(vocabMass == docMass,
      "every encoded occurrence must appear in exactly one vocab bucket")
  }

  test("fertility: n_bpe mass == docTokens mass per source, words count " +
    "non-empty, and fertility is never below 1") {
    val rows = Seq(
      (0L, "low low new", "s0"), (1L, "wide new lowest", "s0"),
      (2L, "low  wide", "s1")) // double space → an empty split token
    val d = rows.map { case (id, t, src) => (id, t, "en", src, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val merges = Bpe.train(d, 4).map(m => (m._2, m._3))
    val got = Bpe.fertility(d, merges).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val docToks = Bpe.docTokens(d, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got("s0")._2 == docToks(0L) + docToks(1L))
    assert(got("s1")._2 == docToks(2L))
    assert(got("s1")._1 == 2L, "the empty split token must not count")
    got.values.foreach { case (w, b, f) =>
      assert(b >= w && f >= 1.0, "every word encodes to at least one token")
    }
  }

  test("more merges never increase a document's token count") {
    val d = docs(Seq("low low low lower newest", "new newer newest wide"))
    val m8 = Bpe.train(d, 8).map(m => (m._2, m._3))
    val short = Bpe.docTokens(d, m8.take(2)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Bpe.docTokens(d, m8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    full.foreach { case (id, n) => assert(n <= short(id)) }
  }
}
