package graft

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ingest.{Bands, Merge}

/** Scalacheck laws for the ingest-side operators: the k-way merge modes
  * (sum / pick-one) and the discrete percentile-band derivation, each
  * against an in-memory reference over random generations / value streams.
  * (merge-mode `union`'s conflict RAISE is pinned by IngestSpec; its
  * agreeing-path result equals sum's dedup shape and is covered there.)
  */
object IngestProps extends Properties("Ingest") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  // generations of (key, off, score) with small integral scores (exact in
  // Double) and deliberately colliding (key, off) cells
  private val gens: Gen[List[Vector[(String, Long, Double)]]] = for {
    k <- Gen.choose(1, 3)
    gs <- Gen.listOfN(k, for {
      n <- Gen.choose(0, 12)
      rows <- Gen.listOfN(n, for {
        key <- Gen.oneOf("a", "b", "c")
        off <- Gen.choose(0L, 4L)
        s <- Gen.choose(-3, 3)
      } yield (key, off, s.toDouble))
    } yield rows.toVector)
  } yield gs

  property("Merge.sum == per-(key,off) sum over all generations") =
    forAll(gens) { gs =>
      val got = Merge.sum(gs.map(_.toDF("key", "off", "score")))
        .collect().map(r => ((r.getString(0), r.getLong(1)), r.getDouble(2)))
        .toMap
      val want = gs.flatten.groupBy { case (k, o, _) => (k, o) }
        .map { case (ko, xs) => ko -> xs.map(_._3).sum }
      got == want
    }

  property("Merge.pickOne == deterministic lowest-score winner") =
    forAll(gens) { gs =>
      // no generation carries percentile columns here, so the pinned winner
      // is simply the lowest score per (key, off)
      val got = Merge.pickOne(gs.map(_.toDF("key", "off", "score")))
        .collect()
        .map(r => ((r.getString(0), r.getLong(1)), (r.getDouble(2), r.getBoolean(3))))
        .toMap
      val want = gs.flatten.groupBy { case (k, o, _) => (k, o) }
        .map { case (ko, xs) => ko -> ((xs.map(_._3).min, false)) }
      got == want
    }

  private val Epoch = java.time.LocalDate.of(2024, 5, 1)

  private val valueStream: Gen[Vector[(String, Int, Double)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      t <- Gen.oneOf("view", "click")
      d <- Gen.choose(0, 2)
      v <- Gen.choose(-50, 50)
    } yield (t, d, v.toDouble))
  } yield rows.toVector

  property("Bands.deriveDaily == in-memory discrete rank-ceil quantiles") =
    forAll(valueStream) { rows =>
      val df = rows.map { case (t, d, v) =>
        (1L, Timestamp.valueOf(Epoch.plusDays(d).atStartOfDay.plusSeconds(60)),
          t, v)
      }.toDF("user_id", "ts", "event_type", "value")
      val got = Bands.deriveDaily(df).collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
            r.getDouble(6))))
        .toMap
      val want = rows.groupBy { case (t, d, _) => (t, d) }
        .map { case ((t, d), xs) =>
          val sorted = xs.map(_._3).sorted
          val n = sorted.size
          def q(k: Int) = sorted(math.max(1, (k * n + 99) / 100) - 1)
          val off = Timestamp.valueOf(Epoch.plusDays(d).atStartOfDay)
            .getTime / 1000
          (s"event:$t", off) -> ((q(50), q(5), q(25), q(75), q(95)))
        }
      got == want
    }
}
