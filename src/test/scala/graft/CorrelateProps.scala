package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ast.Leaf
import graft.exec.CorrelateExec
import graft.model.Tables

/** Randomized end-to-end pinning of CorrelateExec.run against an in-memory
  * interpreter of the full reference pipeline (correlate.cc:464-576):
  * membership sets (B −= A), support limits and prior, the per-key skip on
  * raw size, boolean-vs-continuous dispatch, the split search (via
  * splitSearch — itself equivalence-tested against the distributed
  * splitRanges), per-range re-scoring over DISTINCT in-range offsets, and
  * the log-odds significance gates. Exercises duplicate offsets, all-zero
  * keys, overlapping A/B, and keys below support across seeds. */
class CorrelateProps extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val cutoff = math.log(0.55 / 0.45)

  private def model(index: Seq[(String, Long, Double)],
      aOffs: Set[Long], bOffsRaw: Set[Long]):
      Set[(String, Option[Double], Option[Double], Double, Long, Long)] = {
    val a = aOffs
    val b = bOffsRaw -- a
    if (a.isEmpty || b.isEmpty) return Set.empty
    val limitA = math.max(a.size / 20, 1L)
    val limitB = math.max(b.size / 20, 1L)
    val prior = math.log((a.size + 1.0) / (b.size + 1.0))

    index.groupBy(_._1).toSeq.flatMap { case (key, rows) =>
      if (rows.size < math.min(limitA, limitB)) Seq.empty
      else {
        val continuous = rows.exists(_._3 != 0.0)
        val ranges: Seq[(Option[Double], Option[Double])] =
          if (!continuous) Seq((None, None))
          else {
            val matched = rows
              .filter(r => a(r._2) || b(r._2))
              .map(r => (r._3, if (a(r._2)) 1 else -1))
            CorrelateExec.splitSearch(matched, limitA, limitB, prior)
          }
        ranges.flatMap { case (lo, hi) =>
          val inRange = rows.filter(r =>
            lo.forall(r._3 >= _) && hi.forall(r._3 <= _)).map(_._2).distinct
          val cntA = inRange.count(a)
          val cntB = inRange.count(b)
          val cntAB = cntA + cntB // a, b disjoint
          if (cntA < limitA && cntB < limitB) None
          else {
            val logOdds = math.log((cntA + 1.0) / (cntAB - cntA + 1.0)) - prior
            if (math.abs(logOdds) < cutoff) None
            else Some((key, lo, hi,
              BigDecimal(logOdds).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble, cntA.toLong, cntB.toLong))
          }
        }
      }
    }.toSet
  }

  test("full pipeline matches the in-memory interpreter on random fixtures") {
    val rnd = new scala.util.Random(99)
    for (trial <- 1 to 5) {
      val nDocs = 20 + rnd.nextInt(10)
      def subset(): Set[Long] =
        (1L to nDocs).filter(_ => rnd.nextInt(3) > 0).toSet
      val aOffs = subset()
      val bOffs = subset() // may overlap A — run() must subtract
      val cont = Seq("m1", "m2").flatMap { k =>
        Seq.fill(15 + rnd.nextInt(20))(
          (k, 1L + rnd.nextInt(nDocs), (1 + rnd.nextInt(6)).toDouble))
      }
      val bool = (1L to nDocs).filter(_ => rnd.nextBoolean())
        .map(o => ("bool1", o, 0.0))
      val tiny = Seq(("tiny", 1L, 3.0)) // may fall below support
      val index = cont ++ bool ++ tiny ++
        aOffs.map(o => ("a", o, 0.0)) ++ bOffs.map(o => ("b", o, 0.0))

      val summaries = (1L to nDocs).map(o => (o, s"d$o", "{}"))
      val t = Tables(index.toDF("key", "off", "score"),
        summaries.toDF("off", "key", "json"),
        Seq.empty[(String, String)].toDF("key", "json"))

      val got = CorrelateExec.run(spark, t, Leaf("a"), Leaf("b"))
        .collect().map(r => (r.getString(0),
          Option(r.getAs[java.lang.Double]("min_score")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("max_score")).map(_.doubleValue),
          r.getAs[Double]("log_odds"), r.getAs[Long]("cnt_a"),
          r.getAs[Long]("cnt_b"))).toSet
      graft.util.Caches.drain()

      assert(got == model(index, aOffs, bOffs), s"trial $trial")
    }
  }
}
