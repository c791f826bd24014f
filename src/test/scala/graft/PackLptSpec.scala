package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.CorpusOps

class PackLptSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** documents-shaped frame with controlled token counts. */
  private def docs(n: Int) = (0 until n).map { i =>
    val text = (0 to i % 17).map(j => s"w$j").mkString(" ")
    (i.toLong, text, "en", "s0", text.length.toLong)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  /** Plain-Scala serpentine reference. */
  private def reference(rows: Seq[(Long, Long)], bins: Int,
      shards: Int): Map[Long, (Long, Long, Long)] =
    rows.groupBy(_._1 % shards).flatMap { case (shard, in) =>
      in.sortBy { case (id, nt) => (-nt, md5hex(s"lpt:$id"), id) }
        .zipWithIndex.map { case ((id, nt), idx) =>
          val within = idx % bins
          val bin = if ((idx / bins) % 2 == 0) within else bins - 1 - within
          id -> (shard, nt, bin.toLong)
        }
    }

  test("packLpt equals the plain-Scala serpentine reference") {
    val d = docs(100)
    val toks = d.collect().map(r =>
      r.getLong(0) -> (r.getString(1).split(" ").length.toLong)).toSeq
    val want = reference(toks, 4, 3)
    val got = CorpusOps.packLpt(d, 4, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == want)
  }

  test("bins receive equal doc counts up to one within each shard") {
    val stats = CorpusOps.packLptStats(docs(97), 8, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    stats.groupBy(_._1).foreach { case (_, byBin) =>
      val counts = byBin.map(_._3)
      assert(counts.max - counts.min <= 1,
        s"serpentine fills bins round-robin: $byBin")
    }
  }

  test("manifest checksums XOR-fold to the corpus checksum") {
    // partition independence: XORing every bin's checksum must equal the
    // XOR over all docs, however the layout assigned them
    val d = docs(80)
    val m = CorpusOps.exportManifest(d, 8, 4).collect()
    val folded = m.map(_.getLong(4)).reduce(_ ^ _)
    val whole = CorpusOps.exportManifest(d, 1, 1).collect()
    assert(whole.length == 1)
    assert(folded == whole.head.getLong(4))
    assert(m.map(_.getLong(2)).sum == 80L)
  }

  test("serpentine load spread is bounded by one document") {
    // equal-size case: loads must be EXACTLY equal when every doc has the
    // same token count and the shard count divides evenly
    val d = (0 until 64).map { i =>
      (i.toLong, "a b c d", "en", "s0", 7L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val loads = CorpusOps.packLptStats(d, 4, 2).collect().map(_.getLong(3))
    assert(loads.toSet.size == 1, s"uniform docs -> uniform loads: ${loads.toSeq}")
  }
}
