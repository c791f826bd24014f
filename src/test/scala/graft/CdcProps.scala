package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ml.CorpusOps

/** Scalacheck law for the content-defined chunker against a fully
  * INDEPENDENT plain-Scala transcription (java MessageDigest md5, manual
  * cut/start/fingerprint arithmetic — no Spark expressions): the
  * ChunkCdcSpec pin proves the stateless build equals the windowed Spark
  * reference; this one proves BOTH equal the algorithm as written on
  * paper, so a shared Spark-side misreading cannot self-confirm. Corpora
  * are random short docs over a small vocabulary so cut positions land
  * and miss at random, plus the degenerate shapes (empty text, 1 token,
  * shorter than the gram width). */
object CdcProps extends Properties("Cdc") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  /** The CDC law verbatim: cut BEFORE every position i > 1 whose k-token
    * gram (defined only while i+k−1 ≤ n) hashes to 0 mod `mod` on the
    * first 8 md5 hex chars; chunks tile [1, n]; fp = md5 of the chunk's
    * space-joined tokens. Token split keeps interior/trailing empties,
    * matching Spark's split(text, " "). */
  private def refChunks(text: String, k: Int = 4,
      mod: Int = 16): Set[(Long, Long, Long, String)] = {
    val tok = text.split(" ", -1)
    val n = tok.length
    val cuts = (2 to n).filter { i =>
      i + k - 1 <= n && {
        val h = java.lang.Long.parseLong(
          md5Hex(tok.slice(i - 1, i - 1 + k).mkString(" ")).take(8), 16)
        h % mod == 0
      }
    }
    val starts = 1 +: cuts
    starts.zipWithIndex.map { case (s, j) =>
      val next = if (j == starts.length - 1) n + 1 else starts(j + 1)
      (j.toLong, s.toLong, (next - s).toLong,
        md5Hex(tok.slice(s - 1, next - 1).mkString(" ")))
    }.toSet
  }

  private val docGen: Gen[Vector[String]] = for {
    nDocs <- Gen.choose(1, 8)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.frequency(6 -> Gen.choose(4, 60), 1 -> Gen.choose(0, 3))
      ws <- Gen.listOfN(len, Gen.choose(0, 9))
    } yield ws.map(w => s"t$w").mkString(" "))
  } yield docs.toVector

  property("cdcChunkRows == plain-Scala CDC reference exactly, incl. " +
    "degenerate docs") = forAll(docGen) { docs =>
    val df = docs.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "s0", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.cdcChunkRows(df).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ref = docs.zipWithIndex.map { case (t, i) =>
      i.toLong -> refChunks(t)
    }.toMap
    got == ref
  }
}
