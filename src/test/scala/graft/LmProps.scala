package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ml.CorpusOps

/** Scalacheck laws for the Kneser-Ney parameter derivations against
  * plain-Scala references over RANDOM bigram count tables — including the
  * degenerate counts-of-counts classes (no singletons, no c=4 types) whose
  * guards the fixture tests can only sample. Only the EXACT surfaces are
  * law-checked (per-context lambda, global discounts): they are single
  * rows with a fixed operation order, so equality is bit-for-bit, no
  * rounding tolerance. */
object LmProps extends Properties("Lm") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // random bigram count tables; small alphabets force duplicate contexts
  // and count classes that hit every CASE branch
  private val lmGen: Gen[Vector[(String, String, Long)]] = for {
    n <- Gen.choose(1, 40)
    v <- Gen.choose(1, 8)
    cap <- Gen.oneOf(1, 2, 3, 5, 9) // cap=1 → g2..g4 all empty, etc.
    rows <- Gen.listOfN(n, for {
      a <- Gen.choose(0, v - 1)
      b <- Gen.choose(0, v - 1)
      c <- Gen.choose(1, cap)
    } yield (s"w$a", s"w$b", c.toLong))
  } yield rows.groupBy(r => (r._1, r._2))
    .map { case ((a, b), rs) => (a, b, rs.head._3) }.toVector

  property("knParams lambda == plain-Scala D*n1f/c1 (rounded), c1 >= n1f") =
    forAll(lmGen) { rows =>
      val lm = rows.toDF("w1", "w2", "c")
      val got = CorpusOps.knParams(lm).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getDouble(3)))).toMap
      val ref = rows.groupBy(_._1).map { case (w1, rs) =>
        val c1 = rs.map(_._3).sum
        val n1f = rs.length.toLong
        w1 -> ((c1, n1f,
          BigDecimal(0.75 * n1f / c1)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      got == ref
    }

  property("knDiscounts == plain-Scala Chen-Goodman formulas with empty " +
    "count classes zeroed, never NaN") = forAll(lmGen) { rows =>
    val lm = rows.toDF("w1", "w2", "c")
    val r = CorpusOps.knDiscounts(lm).collect().head
    val (t, g1, g2, g3, g4) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    val (y, d1, d2, d3) =
      (r.getDouble(5), r.getDouble(6), r.getDouble(7), r.getDouble(8))
    def cls(k: Long) = rows.count(_._3 == k).toLong
    val refY = if (cls(1) + 2.0 * cls(2) > 0)
      cls(1) / (cls(1) + 2.0 * cls(2)) else 0.0
    val refD1 = if (cls(1) > 0) 1.0 - 2.0 * refY * cls(2) / cls(1) else 0.0
    val refD2 = if (cls(2) > 0) 2.0 - 3.0 * refY * cls(3) / cls(2) else 0.0
    val refD3 = if (cls(3) > 0) 3.0 - 4.0 * refY * cls(4) / cls(3) else 0.0
    t == rows.length.toLong && g1 == cls(1) && g2 == cls(2) &&
      g3 == cls(3) && g4 == cls(4) &&
      y == refY && d1 == refD1 && d2 == refD2 && d3 == refD3 &&
      !y.isNaN && !d1.isNaN && !d2.isNaN && !d3.isNaN
  }
}
