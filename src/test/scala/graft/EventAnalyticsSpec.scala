package graft

import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp
import graft.operators.EventAnalytics

/** Hand-computed semantics pins for the product-analytics operators. */
class EventAnalyticsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, h: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d $h%02d:00:00")

  // epoch day of 2024-01-d
  private def ep(day: Int): Long = 19723L + (day - 1)

  test("rollingActiveUsers: dense trailing windows over the observed span") {
    val ev = Seq(
      (1L, ts(1), "view"), (2L, ts(1), "view"),
      (1L, ts(2), "view"),
      (3L, ts(9), "view")).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.rollingActiveUsers(ev, 7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // activity days 1, 2, 9; the series is DENSE over 1..9: interior days
    // 3-8 report the count their trailing window implies (days 3-7 still see
    // both users from days 1-2; day 8 sees only day 2's user 1). Days 10-15
    // are past the last observed day and must NOT be reported.
    assert(got == Map(
      ep(1) -> 2L, ep(2) -> 2L, ep(3) -> 2L, ep(4) -> 2L, ep(5) -> 2L,
      ep(6) -> 2L, ep(7) -> 2L, ep(8) -> 1L, ep(9) -> 1L))
  }

  test("funnel: keeps unconverted users, ignores conversions before the source") {
    val ev = Seq(
      (1L, ts(1), "signup"), (1L, ts(3), "purchase"), // converts on day 3
      (2L, ts(5), "signup"), (2L, ts(4), "purchase"), // purchase BEFORE signup
      (3L, ts(2), "signup"),                          // never purchases
      (4L, ts(1), "purchase")                         // never signs up
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.funnel(ev, "signup", "purchase").collect()
      .map(r => (r.getLong(0),
        Option(r.getTimestamp(2)).map(_.toString), r.getBoolean(3))).toSet
    assert(got == Set(
      (1L, Some("2024-01-03 00:00:00.0"), true),
      (2L, None, false), // pre-signup purchase doesn't convert
      (3L, None, false)))  // user 4 absent: no source event
  }

  test("rollingActiveUsers matches the naive per-day count on random data") {
    val rnd = new scala.util.Random(11)
    val act = Seq.fill(400)((rnd.nextInt(20).toLong, rnd.nextInt(40) + 1))
    val ev = act.map { case (u, d) =>
      (u, Timestamp.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d - 1)
        .atTime(rnd.nextInt(24), 0)), "v")
    }.toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.rollingActiveUsers(ev, 7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDay = act.map { case (u, d) => (u, ep(1) + (d - 1)) }.distinct
    val lo = byDay.map(_._2).min
    val hi = byDay.map(_._2).max
    for (d <- lo to hi) {
      val want = byDay.filter { case (_, ad) => ad >= d - 6 && ad <= d }
        .map(_._1).distinct.size.toLong
      assert(got(d) === want, s"day $d")
    }
    assert(got.keySet == (lo to hi).toSet) // dense, no anchors past the span
  }

  test("funnel and retention match naive computations on random data") {
    val rnd = new scala.util.Random(23)
    val rows = Seq.fill(500)((rnd.nextInt(15).toLong,
      rnd.nextInt(30) + 1, rnd.nextInt(24),
      if (rnd.nextBoolean()) "signup" else "purchase"))
      .distinct
    val ev = rows.map { case (u, d, h, t) => (u, ts(d, h), t) }
      .toDF("user_id", "ts", "event_type")
    // funnel vs naive
    val gotF = EventAnalytics.funnel(ev, "signup", "purchase").collect()
      .map(r => r.getLong(0) ->
        (r.getTimestamp(1), Option(r.getTimestamp(2)))).toMap
    val byUser = rows.groupBy(_._1)
    for ((u, rs) <- byUser) {
      val signups = rs.filter(_._4 == "signup").map(r => ts(r._2, r._3))
      if (signups.isEmpty) assert(!gotF.contains(u))
      else {
        val s0 = signups.minBy(_.getTime)
        val conv = rs.filter(_._4 == "purchase").map(r => ts(r._2, r._3))
          .filter(_.getTime >= s0.getTime)
        assert(gotF(u)._1 == s0, s"user $u first signup")
        assert(gotF(u)._2 == (if (conv.isEmpty) None
          else Some(conv.minBy(_.getTime))), s"user $u conversion")
      }
    }
    // retention vs naive
    val gotR = EventAnalytics.retentionCohorts(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val actDays = rows.map(r => (r._1, ep(r._2))).distinct
    val cohort = actDays.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val wantR = actDays.groupBy { case (u, d) => (cohort(u), d - cohort(u)) }
      .view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    assert(gotR == wantR)
  }

  test("retentionCohorts: k measured from each user's own first day") {
    val ev = Seq(
      (1L, ts(1), "v"), (1L, ts(3), "v"),
      (2L, ts(1), "v"), (2L, ts(3), "v"), (2L, ts(3, 5), "v"), // same day 2×
      (3L, ts(2), "v"), (3L, ts(4), "v")).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics.retentionCohorts(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (ep(1), 0L) -> 2L, // users 1,2 on their cohort day
      (ep(1), 2L) -> 2L, // both back on day 3 (user 2 counted once)
      (ep(2), 0L) -> 1L, // user 3's own cohort
      (ep(2), 2L) -> 1L))
  }
}
