package graft

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.operators.EventAnalytics

/** Scalacheck laws for the product-analytics operators against in-memory
  * references over random event logs — sparse activity, interior zero
  * days, unconverted users, pre-`from` conversions, and single-event
  * cohorts all arise at random instead of being hand-planted
  * (EventAnalyticsSpec keeps the directed pins). */
object EventAnalyticsProps extends Properties("EventAnalytics") {
  import TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val Epoch = java.time.LocalDate.of(2024, 3, 1)

  // (user, dayOffset 0..14, secondOfDay, event_type)
  private val events: Gen[Vector[(Long, Int, Int, String)]] = for {
    n <- Gen.choose(1, 40)
    es <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 6L)
      d <- Gen.choose(0, 14)
      s <- Gen.choose(0, 86399)
      t <- Gen.oneOf("view", "click", "purchase")
    } yield (u, d, s, t))
  } yield es.toVector

  private def toDf(es: Seq[(Long, Int, Int, String)]) =
    es.map { case (u, d, s, t) =>
      (u, Timestamp.valueOf(Epoch.plusDays(d).atStartOfDay.plusSeconds(s)), t)
    }.toDF("user_id", "ts", "event_type")

  private def epochDay(d: Int): Long = Epoch.plusDays(d).toEpochDay

  property("rollingActiveUsers == in-memory trailing-window distinct") =
    forAll(events, Gen.choose(1, 5)) { (es, w) =>
      val got =
        EventAnalytics.rollingActiveUsers(toDf(es), w).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val act = es.map { case (u, d, _, _) => (u, epochDay(d)) }.toSet
      val (lo, hi) = (act.map(_._2).min, act.map(_._2).max)
      // DISTINCT users per trailing window (a user active on several
      // window days must count once)
      val want = (lo to hi).map { d =>
        d -> act.filter { case (_, ad) => ad >= d - w + 1 && ad <= d }
          .map(_._1).size.toLong
      }.toMap
      got == want
    }

  property("funnel == in-memory first-from / first-to-at-or-after") =
    forAll(events) { es =>
      val got = EventAnalytics.funnel(toDf(es), "view", "purchase")
        .collect().map(r => (r.getLong(0),
          r.getTimestamp(1), Option(r.getTimestamp(2)), r.getBoolean(3))).toSet
      def ts(d: Int, s: Int) =
        Timestamp.valueOf(Epoch.plusDays(d).atStartOfDay.plusSeconds(s))
      val byUser = es.groupBy(_._1)
      val want = byUser.flatMap { case (u, rows) =>
        val views = rows.filter(_._4 == "view").map(r => ts(r._2, r._3))
        if (views.isEmpty) None
        else {
          val from = views.minBy(_.getTime)
          val to = rows.filter(_._4 == "purchase").map(r => ts(r._2, r._3))
            .filter(t => !t.before(from))
          val toTs = if (to.isEmpty) None else Some(to.minBy(_.getTime))
          Some((u, from, toTs, toTs.isDefined))
        }
      }.toSet
      got == want
    }

  property("retentionCohorts == in-memory first-seen bucketing") =
    forAll(events) { es =>
      val got = EventAnalytics.retentionCohorts(toDf(es)).collect()
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      val act = es.map { case (u, d, _, _) => (u, epochDay(d)) }.toSet
      val cohort = act.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
      val want = act.groupBy { case (u, d) => (cohort(u), d - cohort(u)) }
        .map { case (key, xs) => key -> xs.map(_._1).size.toLong }
      got == want
    }
}
