package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ml.{CorpusOps, NearDup, TextAnalysis}

/** Scalacheck laws for the late-r19 curation additions.
  *
  *  - FUNNEL CONSERVATION: every doc is charged to exactly one stage (or
  *    survives), the n_in/n_out chain telescopes, and the by-source rows
  *    sum to the corpus-wide rows. The corpus generator includes EMPTY
  *    texts deliberately: they originally raised ANSI DIVIDE_BY_ZERO in
  *    the quality ratio (this law found it; the punctRatio pin made
  *    quality total), and a NULL keep flag would drop a doc from every
  *    stage count on both engines — invisible to the oracle compare,
  *    only this law holds the line.
  *  - NOVELTY: per doc, n_novel counts exactly its distinct shingles with
  *    corpus df = 1 (checked against an in-memory reference) and <3-token
  *    docs are absent.
  *  - FUZZY = PAIR-GRAPH FILTER: the live cross-split banded probe equals
  *    decontaminateFuzzyFrom over the full nearDuplicates pair graph for
  *    any corpus and boundary — the contract that lets the stored entry
  *    share the live oracle.
  */
object CurationProps extends Properties("Curation") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val blocked = Seq("slow", "dup", "legacy")

  /** Word pool spanning every funnel stage: English/German stopwords
    * (langid), filler mass (quality is the token count for pure-word
    * text), blocklist terms. */
  private val pool: Vector[String] =
    Vector("the", "and", "of", "der", "die", "und", "slow", "legacy") ++
      (1 to 30).map(i => s"w$i")

  private def docGen: Gen[(String, String)] = for {
    n <- Gen.frequency(1 -> Gen.const(0), 6 -> Gen.choose(1, 140))
    toks <- Gen.listOfN(n, Gen.oneOf(pool))
    src <- Gen.oneOf("a", "b")
  } yield (toks.mkString(" "), src)

  private def corpusGen: Gen[Vector[(Long, String, String)]] = for {
    n <- Gen.choose(2, 8)
    docs <- Gen.listOfN(n, docGen)
    dup <- Gen.oneOf(true, false)
  } yield {
    val base = docs.zipWithIndex
      .map { case ((t, s), i) => (i.toLong, t, s) }.toVector
    if (dup) base :+ base.head.copy(_1 = 900L) else base
  }

  /** The funnel corpus additionally carries NULL texts (ADVICE r19: only
    * keep_q was coalesced, so a NULL text left keep_lang/keep_bl NULL and
    * the all-NULL langid tie-break charged the doc to DIFFERENT stages
    * across engines; both sides now coalesce text to '' first — a NULL
    * doc must be charged to stage 1 like any other non-`lang` doc). Kept
    * separate from corpusGen: the novelty property's in-memory reference
    * splits the text directly. */
  private def corpusGenWithNulls: Gen[Vector[(Long, String, String)]] = for {
    base <- corpusGen
    nullify <- Gen.listOfN(base.size,
      Gen.frequency(4 -> Gen.const(false), 1 -> Gen.const(true)))
  } yield base.zip(nullify).map { case (d, nn) =>
    if (nn) d.copy(_2 = null) else d
  }

  property("funnel conserves every doc and telescopes; by-source sums " +
      "to corpus-wide") = forAll(corpusGenWithNulls) { docs =>
    val df = docs.toDF("doc_id", "text", "source")
    val rows = TextAnalysis.funnelReport(df, 0.5, "en", blocked).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .sortBy(_._1).map(_._2)
    val chainOk = rows.head._1 == docs.size &&
      rows.forall { case (nIn, d, nOut) => nIn - d == nOut } &&
      rows.sliding(2).forall {
        case Array((_, _, out), (nIn, _, _)) => out == nIn
        case _ => true
      }
    val bySrc = TextAnalysis.funnelBySource(df, 0.5, "en", blocked)
      .collect()
      .map(r => (r.getLong(1), (r.getLong(3), r.getLong(4), r.getLong(5))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).reduce((a, b) =>
        (a._1 + b._1, a._2 + b._2, a._3 + b._3))).toMap
    val sumOk = (1 to 4).forall(i => bySrc(i.toLong) == rows(i - 1))
    chainOk && sumOk
  }

  property("ngramNovelty counts exactly the df=1 shingles") =
    forAll(corpusGen) { docs =>
      val sh: Map[Long, Set[String]] = docs.map { case (id, t, _) =>
        val tk = t.split(" ", -1).toSeq
        id -> (if (tk.size < 3) Set.empty[String]
               else tk.sliding(3).map(_.mkString(" ")).toSet)
      }.toMap
      val df = sh.values.flatten.groupBy(identity).view
        .mapValues(_.size).toMap
      val want = sh.collect { case (id, s) if s.nonEmpty =>
        id -> ((s.size.toLong, s.count(df(_) == 1).toLong))
      }
      val got = CorpusOps.ngramNovelty(docs.toDF("doc_id", "text", "source"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      got == want
    }

  property("live fuzzy decontamination == cross-split filter of the " +
      "full pair graph") = forAll(corpusGen, Gen.choose(1L, 8L)) {
    (docs, boundary) =>
      val df = docs.toDF("doc_id", "text", "source")
      val live = CorpusOps.decontaminateFuzzy(df, boundary, 0.5)
        .collect().map(_.toSeq).toSet
      val fromGraph = CorpusOps.decontaminateFuzzyFrom(
          NearDup.nearDuplicates(df, 0.5), boundary)
        .collect().map(_.toSeq).toSet
      live == fromGraph
  }
}
