package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ml.{Clusters, Multimodal}

/** Pins the image near-dup CLUSTER lifecycle (VERDICT r18 #5): connected
  * components over the banded Hamming pair graph must transitively merge
  * chains the pairwise output alone under-deletes (A~B, B~C one cluster
  * even when A–C exceeds the radius), and the removal verb must keep
  * exactly each component's canonical minimum plus every unclustered doc.
  * The oracle entries (mm_phash_clusters/mm_phash_removal) check the same
  * pipeline against a brute-force recursive-CTE closure at sf0.01; this
  * spec pins the transitive-chain case explicitly on a controlled graph. */
class PhashClustersSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def flip(h: String, idx: Int*): String =
    h.zipWithIndex.map { case (c, i) =>
      if (idx.contains(i)) (if (c == '0') '1' else '0') else c }.mkString

  test("components over the phash pair graph merge transitive chains; " +
      "removal keeps component minima + unclustered docs") {
    val a = "0" * 63
    val b = flip(a, 0, 1)        // d(a,b) = 2
    val c = flip(b, 10, 11)      // d(b,c) = 2, d(a,c) = 4 > radius 3
    val far = flip(a, (20 until 40): _*) // isolated
    val rows = Seq(1L -> a, 2L -> b, 3L -> c, 4L -> far, 5L -> a)
    val df = rows.toDF("doc_id", "ph")
    val pairs = Multimodal.phashNearFrom(df, 3)
    // the chain pair (1,3) must NOT be a pair (distance 4)...
    val pset = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pset.contains((1L, 3L)), s"d=4 pair leaked: $pset")
    assert(pset == Set((1L, 2L), (2L, 3L), (1L, 5L), (2L, 5L)), pset)
    // ...but components must still merge {1,2,3,5} through doc 2
    val cl = Clusters.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L), cl)
    // removal over the hashed universe: cluster minimum + the isolated doc
    val kept = Clusters.removalFrom(df.select("doc_id"),
        Clusters.connectedComponents(pairs))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), kept)
    graft.util.Caches.drain()
  }

  test("keepBestScoredFrom keeps the argmax (ties -> lowest doc_id) per " +
      "cluster and every unclustered doc") {
    val universe = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val clusters = Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L)
      .toDF("doc_id", "cluster_id")
    val scores = Seq(1L -> 10L, 2L -> 50L, 3L -> 50L, 4L -> 1L, 5L -> 7L)
      .toDF("doc_id", "sharpness")
    val kept = Clusters.keepBestScoredFrom(universe, clusters, scores,
        "sharpness").collect().map(_.getLong(0)).toSet
    // 2 and 3 tie at 50 -> lowest doc_id (2) wins; 4 is unclustered
    assert(kept == Set(2L, 4L), kept)
  }

  test("imageSharpness == the exact integer n*sum(x^2)-(sum(x))^2 over the " +
      "planted ASCII pixels") {
    val text = ("ab" * 20) // 40 printable chars -> first 32 are the pixels
    val df2 = Seq((7L, text, "en", "s0", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.imageSharpness(spark, df2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val codes = text.take(32).map(_.toLong)
    val want = 32L * codes.map(c => c * c).sum - codes.sum * codes.sum
    assert(got == Map(7L -> want), s"got $got want $want")
  }
}
