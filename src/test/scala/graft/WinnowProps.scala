package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.NearDup

/** Randomized pinning of the winnowing guarantee (Schleimer/Wilkerson/
  * Aiken, SIGMOD'03 thm. "local algorithms"): two documents sharing ANY
  * token run of length ≥ k + w − 1 share at least one winnowed
  * fingerprint, for every placement of the run and any surrounding noise.
  * Also pins the converse sanity (token-disjoint docs share nothing — md5
  * prefixes can't collide across disjoint gram sets at these sizes) and
  * the per-doc in-memory model of the sketch itself. */
class WinnowProps extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val K = 3
  private val W = 4

  /** In-memory transcription of winnowFingerprints for one doc. */
  private def sketch(tokens: Seq[String]): Set[String] = {
    if (tokens.length < K + W - 1) return Set.empty
    val grams = tokens.sliding(K).map(_.mkString(" ")).toVector
    val hs = grams.map { g =>
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(g.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x")
        .mkString.take(8)
    }
    hs.sliding(W).map(_.min).toSet
  }

  test("sketch matches the in-memory model on random docs") {
    val rnd = new scala.util.Random(31)
    val docs = (1L to 20L).map { i =>
      (i, Seq.fill(K + W - 1 + rnd.nextInt(30))(s"t${rnd.nextInt(12)}")
        .mkString(" "))
    }
    val got = NearDup.winnowFingerprints(docs.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((id, text) <- docs) {
      val want = sketch(text.split(" ").toSeq)
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
  }

  test("guarantee: any shared run of k+w-1 tokens yields a shared fingerprint") {
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 12) {
      val run = Seq.fill(K + W - 1 + rnd.nextInt(4))(s"run${rnd.nextInt(1000)}_$trial")
      def noise(n: Int) = Seq.fill(n)(s"n${rnd.nextInt(100000)}")
      // the run lands at a random position inside both docs
      val a = noise(rnd.nextInt(15)) ++ run ++ noise(rnd.nextInt(15))
      val b = noise(rnd.nextInt(15)) ++ run ++ noise(rnd.nextInt(15))
      val shared = sketch(a) intersect sketch(b)
      assert(shared.nonEmpty,
        s"trial $trial: shared ${run.length}-token run, no shared fingerprint")
      // and the distributed pair generator surfaces the pair
      val docs = Seq((1L, a.mkString(" ")), (2L, b.mkString(" ")))
        .toDF("doc_id", "text")
      val pairs = NearDup.winnowCandidates(docs, minShared = 1, maxDf = 50)
        .collect()
      assert(pairs.length == 1 && pairs.head.getLong(0) == 1L)
    }
  }

  test("token-disjoint docs share no fingerprints") {
    val a = (1 to 30).map(i => s"left$i")
    val b = (1 to 30).map(i => s"right$i")
    assert((sketch(a) intersect sketch(b)).isEmpty)
  }
}
