package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ml.Clusters

/** Scalacheck law for the iterative min-label connected components
  * (Clusters.connectedComponents) against a union-find reference over
  * random edge lists — chains, cliques, stars, self-contained islands and
  * multi-round propagation shapes (long paths force >1 label round) all
  * drawn at random rather than hand-built. */
object ClusterProps extends Properties("Clusters") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val edges: Gen[Vector[(Long, Long)]] = for {
    n <- Gen.choose(1, 14)
    es <- Gen.listOfN(n, for {
      a <- Gen.choose(0L, 19L)
      b <- Gen.choose(0L, 19L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield es.toVector.distinct

  private def refComponents(es: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  property("connectedComponents == union-find over random graphs") =
    forAll(edges) { es =>
      val got =
        try Clusters.connectedComponents(es.toDF("doc_a", "doc_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        finally graft.util.Caches.drain()
      got == refComponents(es)
    }
}
