package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ml.SpanDedup

/** Scalacheck laws for the span family against an in-memory transcription
  * of the W-shingle / df>1 / gaps-and-islands pipeline. Random corpora
  * draw from a tiny vocabulary with deliberately repeated runs, so shared
  * shingles, island merges across overlapping matches, boundary touching
  * (gap exactly W), and short docs all occur naturally.
  */
object SpanProps extends Properties("SpanDedup") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val W = SpanDedup.W

  // docs built from named runs: each doc concatenates 1-3 segments drawn
  // from a small pool of shared runs + unique filler, so cross-document
  // shared W-grams are common but not universal
  private val sharedRuns: Vector[Vector[String]] = Vector(
    (1 to 12).map(i => s"x$i").toVector,
    (1 to 9).map(i => s"y$i").toVector,
    (1 to 15).map(i => s"z$i").toVector)

  // filler segments use generator-drawn salts, not Random (shrink-safety)
  private def corpusDet: Gen[Vector[(Long, String)]] = for {
    n <- Gen.choose(2, 5)
    docs <- Gen.listOfN(n, for {
      nseg <- Gen.choose(1, 3)
      segs <- Gen.listOfN(nseg, Gen.frequency(
        3 -> Gen.oneOf(sharedRuns),
        2 -> Gen.choose(1, 10).flatMap(m => Gen.choose(0, 1 << 20).map(s =>
          (1 to m).map(i => s"u${s}_$i").toVector))))
    } yield segs.flatten)
  } yield docs.zipWithIndex
    .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }.toVector

  /** In-memory reference: W-shingles per position, cross-document df,
    * marked positions merged into maximal spans (gap ≤ W joins). */
  private def refSpans(docs: Seq[(Long, String)],
      marked: (Map[Seq[String], Set[Long]], Long, Seq[String]) => Boolean)
      : Set[(Long, Int, Int)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val sh = for {
      (id, tk) <- toks if tk.size >= W
      p <- 0 to tk.size - W
    } yield (id, p, tk.slice(p, p + W))
    val byShingle = sh.groupBy(_._3).map { case (s, xs) =>
      s -> xs.map(_._1).toSet }
    val spans = for ((id, tk) <- toks) yield {
      val ps = sh.collect { case (i, p, s)
        if i == id && marked(byShingle, id, s) => p }.sorted
      // gaps-and-islands: break when gap > W
      val islands = ps.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
        if (acc.nonEmpty && p - acc.last.last <= W) acc.init :+ (acc.last :+ p)
        else acc :+ Vector(p)
      }
      islands.map(is => (id, is.min, is.max + W - 1))
    }
    spans.flatten.toSet
  }

  private def run(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Int)] =
    try df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    finally graft.util.Caches.drain()

  property("sharedSpans == in-memory reference over random corpora") =
    forAll(corpusDet) { docs =>
      val got = run(SpanDedup.sharedSpans(docs.toDF("doc_id", "text")))
      val want = refSpans(docs,
        (by, _, s) => by(s).size > 1)
      got == want
    }

  property("benchSpans == in-memory reference (bench side gates)") =
    forAll(corpusDet, Gen.choose(1L, 3L)) { (docs, benchMax) =>
      val got = run(SpanDedup.benchSpansFrom(
        SpanDedup.spanShingles(docs.toDF("doc_id", "text")), benchMax))
      val want = refSpans(docs,
        (by, id, s) => id >= benchMax && by(s).exists(_ < benchMax))
      got == want
    }
}
