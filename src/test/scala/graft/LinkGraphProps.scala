package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ml.LinkGraph

/** Randomized engine-equality for the integer PageRank: on ARBITRARY small
  * directed graphs — including dangling hosts (in-edges only) and multi-
  * edges — the Spark plan must equal the plain-Scala reference EXACTLY,
  * because every operation is integer arithmetic. Dangling mass evaporates
  * identically in both (the planted corpus graph has none by construction;
  * these graphs do, which is the point: the equality must not depend on
  * the planted shape). */
object LinkGraphProps extends Properties("LinkGraph") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 10)
    m <- Gen.choose(1, 25)
    edges <- Gen.listOfN(m, for {
      s <- Gen.choose(0L, n - 1L)
      d <- Gen.choose(0L, n - 1L) if d != s
    } yield (s, d))
    if edges.nonEmpty
  } yield edges

  property("Spark == plain-Scala reference on arbitrary graphs") =
    forAll(graphGen) { edges =>
      val edf = edges.toDF("src", "dst")
        .groupBy("src", "dst")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_docs"))
      val hosts = (edges.map(_._1) ++ edges.map(_._2)).distinct
      val want = LinkGraph.referencePageRank(edges)
      val got = LinkGraph.pageRank(edf, hosts.size.toLong).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      got == want
    }
}
