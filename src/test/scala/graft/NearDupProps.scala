package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ml.NearDup

/** Scalacheck law for the complete banded-MinHash pipeline
  * (NearDup.nearDuplicates) against an in-memory transcription: 3-word
  * distinct shingles, K=8 lexicographic-min md5 signatures, 4 bands of 2
  * rows, candidate pairs sharing any (band, key) bucket, exact Jaccard
  * verification. Corpora mix shared runs (near-dups by construction) with
  * salted filler, so banding both fires and prunes at random.
  */
object NearDupProps extends Properties("NearDup") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  private val baseRun: Vector[String] = (1 to 25).map(i => s"w$i").toVector

  /** Docs: a mutated copy of the base run (near-dups at high probability)
    * or salted filler (unrelated). */
  private def corpus: Gen[Vector[(Long, String)]] = for {
    n <- Gen.choose(2, 6)
    docs <- Gen.listOfN(n, Gen.frequency(
      3 -> (for {
        nMut <- Gen.choose(0, 3)
        at <- Gen.listOfN(nMut, Gen.choose(0, baseRun.size - 1))
      } yield at.foldLeft(baseRun) { (v, i) => v.updated(i, s"CH$i") }),
      2 -> Gen.choose(0, 1 << 20).flatMap(s => Gen.choose(5, 20).map(m =>
        (1 to m).map(i => s"f${s}_$i").toVector))))
  } yield docs.zipWithIndex
    .map { case (toks, i) => (i.toLong, toks.mkString(" ")) }.toVector

  private def refPairs(docs: Seq[(Long, String)],
      minJaccard: Double): Set[(Long, Long, Double)] = {
    val sh = docs.map { case (id, t) =>
      val tk = t.split(" ", -1).toSeq
      id -> (if (tk.size < 3) Set.empty[String]
             else tk.sliding(3).map(_.mkString(" ")).toSet)
    }.toMap
    def sig(s: Set[String]): Vector[String] =
      (0 until NearDup.NumHashes).map(k =>
        s.map(x => md5Hex(s"$k:$x")).min).toVector
    def bandKeys(m: Vector[String]): Seq[String] =
      (0 until NearDup.NumHashes / NearDup.Rows).map { b =>
        val parts = (0 until NearDup.Rows).map { r =>
          (if (r == 0) s"$r:" else s"|$r:") + m(b * NearDup.Rows + r) }
        s"$b:" + md5Hex(parts.mkString)
      }
    val withSh = docs.collect { case (id, _) if sh(id).nonEmpty => id }
    val keys = withSh.map(id => id -> bandKeys(sig(sh(id))).toSet).toMap
    (for {
      a <- withSh; b <- withSh if a < b
      if keys(a).intersect(keys(b)).nonEmpty
      i = sh(a).intersect(sh(b)).size
      j = BigDecimal(i.toDouble / (sh(a).size + sh(b).size - i))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= minJaccard
    } yield (a, b, j)).toSet
  }

  property("nearDuplicates == in-memory banded-MinHash transcription") =
    forAll(corpus, Gen.oneOf(0.3, 0.6, 0.9)) { (docs, tau) =>
      val got =
        try NearDup.nearDuplicates(docs.toDF("doc_id", "text"), tau)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        finally graft.util.Caches.drain()
      got == refPairs(docs, tau)
    }
}
