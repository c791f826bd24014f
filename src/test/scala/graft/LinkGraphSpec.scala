package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.LinkGraph

class LinkGraphSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** documents-shaped frame covering every host residue class. */
  private def docs(n: Int) = (0 until n).map { i =>
    (i.toLong, s"word$i text", "en", s"src${i % 4}", 10L)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("plantedEdges has no self-loops and covers every host") {
    val e = LinkGraph.plantedEdges(docs(200)).collect()
    assert(e.forall(r => r.getLong(0) != r.getLong(1)),
      "offsets lie in 1..H-1, so src == dst must be impossible")
    val srcs = e.map(_.getLong(0)).toSet
    assert(srcs == (0L until LinkGraph.Hosts.toLong).toSet,
      "with docs >> H every residue class must emit edges (no dangling)")
    // weights count contributing docs: total mass = 2 links per doc
    assert(e.map(_.getLong(2)).sum == 2L * 200)
  }

  test("pageRank equals the plain-Scala integer reference bit-for-bit") {
    val edf = LinkGraph.plantedEdges(docs(150))
    val edges = edf.select("src", "dst").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val n = (edges.map(_._1) ++ edges.map(_._2)).distinct.size.toLong
    val want = LinkGraph.referencePageRank(edges)
    val got = LinkGraph.pageRank(edf, n).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      "fixed-point integer arithmetic must make Spark == reference exact")
  }

  test("rank mass is conserved up to integer-floor slack") {
    val edf = LinkGraph.plantedEdges(docs(150))
    val e = edf.select("src", "dst").distinct().collect()
    val nE = e.length
    val hosts = (e.map(_.getLong(0)) ++ e.map(_.getLong(1))).distinct
    val n = hosts.length.toLong
    val ranks = LinkGraph.pageRank(edf, n).collect().map(_.getLong(1))
    assert(ranks.length == n)
    val total = ranks.sum
    // each iteration loses < E (odeg floors) + 2N (damping + base floors)
    val slack = LinkGraph.Iterations.toLong * (nE + 2 * n) + n
    assert(total <= LinkGraph.Scale, s"mass cannot exceed Scale: $total")
    assert(total >= LinkGraph.Scale - slack,
      s"floor losses bounded: $total vs ${LinkGraph.Scale - slack}")
  }

  test("uniform in/out-degree graph keeps the uniform fixed point") {
    // directed ring 0→1→…→k-1→0: odeg = indeg = 1 everywhere, so the
    // uniform vector is exactly invariant under the integer update too
    val k = 8
    val ring = (0 until k).map(i => (i.toLong, ((i + 1) % k).toLong, 1L))
      .toDF("src", "dst", "n_docs")
    val r = LinkGraph.pageRank(ring, k.toLong).collect().map(_.getLong(1))
    assert(r.toSet.size == 1, s"ring ranks must stay uniform: ${r.toSeq}")
  }

  test("sourceRankMass aggregates exact integer rank per source") {
    val d = docs(96)
    val edf = LinkGraph.plantedEdges(d)
    val n = LinkGraph.Hosts.toLong
    val ranks = LinkGraph.pageRank(edf, n)
    val got = LinkGraph.sourceRankMass(d, ranks).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rmap = ranks.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = (0 until 96).groupBy(i => s"src${i % 4}").map { case (s, is) =>
      s -> (is.size.toLong, is.map(i => rmap(i.toLong % n)).sum)
    }
    assert(got == want)
  }
}
