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

  /** Plain-Scala keep-first surgery over refChunks: canonical occurrence
    * per fingerprint = min (doc_id, chunk_id); every other occurrence's
    * token range is excised; survivors re-join with single spaces. */
  private def refCut(docs: Vector[String]): Map[Long, String] = {
    val chunks = docs.zipWithIndex.flatMap { case (t, i) =>
      refChunks(t).map { case (cid, s, n, fp) => (i.toLong, cid, s, n, fp) }
    }
    val canon = chunks.groupBy(_._5).view
      .mapValues(_.map(c => (c._1, c._2)).min).toMap
    val cutsByDoc = chunks
      .filter(c => canon(c._5) != ((c._1, c._2)))
      .groupBy(_._1).view
      .mapValues(_.map(c => (c._3 - 1, c._3 + c._4 - 2))).toMap
    docs.zipWithIndex.map { case (t, i) =>
      val ranges = cutsByDoc.getOrElse(i.toLong, Vector.empty)
      i.toLong -> t.split(" ", -1).zipWithIndex.collect { case (w, j)
        if !ranges.exists(r => j >= r._1 && j <= r._2) => w }.mkString(" ")
    }.toMap
  }

  // duplicate-heavy corpora: keep-first only bites when fingerprints
  // actually repeat, so re-append a random subset of the docs
  private val dupDocGen: Gen[Vector[String]] = for {
    base <- docGen
    extra <- Gen.someOf(base)
  } yield base ++ extra

  property("cdcCutKeepFirstFrom == plain-Scala keep-first surgery " +
    "exactly (cross- and within-doc duplicates, degenerate docs)") =
    forAll(dupDocGen) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) =>
        (i.toLong, t, "en", "s0", t.length.toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = CorpusOps
        .cdcCutKeepFirstFrom(CorpusOps.cdcChunkRows(df), df)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == refCut(docs)
    }

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
