package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps

/** Semantics + plan-shape pins for the time-series operators. */
class TimeSeriesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("asofJoin: latest right <= left, inclusive at equal ts, null before first") {
    val left = Seq((1L, 10L, "p10"), (1L, 20L, "p20"), (1L, 5L, "p5"),
                   (2L, 10L, "q10")).toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (2L, 11L, 9.0))
      .toDF("k", "ts", "v")
    val got = TimeSeriesOps.asofJoin(left, right, "k", "ts", Seq("v"))
      .select("k", "ts", "tag", "r_ts", "r_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1.0 else r.getDouble(4))).toSet
    assert(got === Set(
      (1L, 5L, "p5", -1L, -1.0),       // before any right row
      (1L, 10L, "p10", 10L, 1.0),      // equal ts IS visible (<=)
      (1L, 20L, "p20", 15L, 2.0),      // latest wins, not first
      (2L, 10L, "q10", -1L, -1.0)))    // other key's rows don't leak
  }

  test("asofJoin: a NULL carry in the LATEST right row is attached as-is " +
      "— never stitched with an older row's value (review finding, r19: " +
      "per-column ignoreNulls carries mixed fields across right rows)") {
    val left = Seq((1L, 30L)).toDF("k", "ts")
    val right = Seq((1L, 10L, Some(5.0)), (1L, 20L, None))
      .toDF("k", "ts", "v")
    val got = TimeSeriesOps.asofJoin(left, right, "k", "ts", Seq("v"))
      .select("k", "ts", "r_ts", "r_v").collect().head
    assert(got.getLong(2) == 20L, "latest right row must attach")
    assert(got.isNullAt(3),
      s"its NULL v must attach verbatim, not the older 5.0: $got")
  }

  test("asofJoin matches per-row naive computation on random data") {
    val rnd = new scala.util.Random(42)
    val ls = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, t.toDouble) }
    val rs = Seq.fill(200)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .distinct.map { case (k, t) => (k, t, t * 10.0) }
    val got = TimeSeriesOps.asofJoin(
        ls.toDF("k", "ts", "lv"), rs.toDF("k", "ts", "rv"), "k", "ts", Seq("rv"))
      .select("k", "ts", "r_ts").collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    for ((k, t, _) <- ls) {
      val want = rs.filter(r => r._1 == k && r._2 <= t)
        .map(_._2).maxOption
      assert(got((k, t)) === want, s"key=$k ts=$t")
    }
  }

  test("dowProfile: integer weekday buckets and a mean-ratio index") {
    // dnum 0 = Thu 1970-01-01 → dow (0+4)%7 = 4; dnum 3 = Sunday → dow 0.
    // key "a": two Thursdays of 30 events + one Sunday of 3 → overall
    // daily mean 21, Thursday mean 30 (idx 1.4286), Sunday mean 3 (0.1429)
    val daily = Seq(("a", 0L, 30L), ("a", 7L, 30L), ("a", 3L, 3L))
      .toDF("event_type", "dnum", "n")
    val got = TimeSeriesOps.dowProfile(daily).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got === Set(
      ("a", 4L, 2L, 60L, 1.4286),
      ("a", 0L, 1L, 3L, 0.1429)))
  }

  test("gapFillDaily: dense per-key grid, forward fill, filled flags") {
    val s = Seq((1L, "2024-01-01", 5.0), (1L, "2024-01-04", 7.0),
                (2L, "2024-01-02", 3.0))
      .toDF("k", "d", "v").select($"k", to_date($"d").as("d"), $"v")
    val got = TimeSeriesOps.gapFillDaily(s, "k", "d", "v")
      .select($"k", date_format($"d", "yyyy-MM-dd").as("d"), $"v", $"filled")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getBoolean(3))).toSet
    assert(got === Set(
      (1L, "2024-01-01", 5.0, false),
      (1L, "2024-01-02", 5.0, true),   // carried forward
      (1L, "2024-01-03", 5.0, true),
      (1L, "2024-01-04", 7.0, false),
      (2L, "2024-01-02", 3.0, false))) // singleton span: no synthesis
  }

  test("gapFillDaily matches naive forward-fill on random sparse series") {
    val rnd = new scala.util.Random(17)
    val obs = (for (k <- 0L until 6L) yield {
      val days = rnd.shuffle((0 to 50).toList).take(rnd.nextInt(10) + 2).sorted
      days.map(d => (k, d, rnd.nextInt(100).toDouble))
    }).flatten
    val s = obs.map { case (k, d, v) =>
      (k, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d)), v)
    }.toDF("k", "d", "v")
    val got = TimeSeriesOps.gapFillDaily(s, "k", "d", "v")
      .select($"k", datediff($"d", lit("2024-01-01")).as("d"), $"v", $"filled")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    for ((k, rows) <- obs.groupBy(_._1)) {
      val byDay = rows.map(r => r._2 -> r._3).toMap
      val (d0, d1) = (rows.map(_._2).min, rows.map(_._2).max)
      assert(got.keys.count(_._1 == k) == d1 - d0 + 1, s"key $k grid size")
      var carry = 0.0
      for (d <- d0 to d1) {
        byDay.get(d).foreach(carry = _)
        assert(got((k, d)) == ((carry, !byDay.contains(d))), s"key $k day $d")
      }
    }
  }

  test("rangeJoinDays == naive theta join, invariant to bucket width") {
    val rnd = new scala.util.Random(7)
    val ranges = (1 to 40).map { i =>
      val d0 = rnd.nextInt(60)
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d0)),
        java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(d0 + 1 + rnd.nextInt(10))))
    }.toDF("rid", "d0", "d1")
    val points = (1 to 500).map { i =>
      (i.toLong, java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1).plusDays(rnd.nextInt(70))))
    }.toDF("pid", "pd")
    val naive = ranges.join(points, $"pd" >= $"d0" && $"pd" < $"d1")
      .select("rid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (width <- Seq(1, 7, 30)) {
      val got = TimeSeriesOps.rangeJoinDays(ranges, "d0", "d1", points, "pd", width)
        .select("rid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive, s"bucketDays=$width")
    }
  }

  test("asofJoin plans as ONE exchange with all carries in a single Window") {
    val left = Seq((1L, 10L, 1.0)).toDF("k", "ts", "lv")
    val right = Seq((1L, 5L, 2.0, "x")).toDF("k", "ts", "rv", "rw")
    val plan = TimeSeriesOps.asofJoin(left, right, "k", "ts", Seq("rv", "rw"))
      .queryExecution.executedPlan.toString
    // the union+window formulation: exactly one hash exchange on the key —
    // a join-based as-of would add a second (or a per-key expansion)
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
    // the foldLeft over carry columns must fuse into ONE Window operator
    // (same partition/order spec), not a window per carried column
    assert("Window ".r.findAllIn(plan).length == 1, plan)
  }

  test("zscoreDaily: a planted spike flags, the rest of its series and a " +
    "constant series do not, and z matches the hand-computed moments") {
    // key "a": nine 10s and one 100 — mean 19, var = E[x²]−mean² = 729
    val a = (1L to 9L).map(d => ("a", d, 10L)) :+ (("a", 10L, 100L))
    // key "b": constant — σ = 0 must flag nothing and report z = 0
    val b = (1L to 5L).map(d => ("b", d, 7L))
    val got = TimeSeriesOps.zscoreDaily(
        (a ++ b).toDF("k", "dnum", "v"), "k", "dnum", "v", 2.0)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(3), r.getBoolean(4))).toMap
    val sd = math.sqrt(729.0)
    assert(got(("a", 10L)) == (BigDecimal((100 - 19) / sd)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, true))
    for (d <- 1L to 9L) {
      val (z, flag) = got(("a", d))
      assert(!flag && math.abs(z - BigDecimal((10 - 19) / sd)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    for (d <- 1L to 5L) assert(got(("b", d)) == (0.0, false))
  }

  test("movingAvgDaily: RANGE frame shrinks over gap days (calendar-aware)") {
    val s = Seq((1L, 0L, 10.0), (1L, 1L, 20.0), (1L, 9L, 30.0))
      .toDF("k", "dnum", "v")
    val got = TimeSeriesOps.movingAvgDaily(s, "k", "dnum", "v", 7)
      .collect().map(r => (r.getLong(1), r.getDouble(2))).toMap
    // day 9 is >6 days past both others → frame holds only itself;
    // a ROWS frame would have wrongly averaged the last 3 observations
    assert(got == Map(0L -> 10.0, 1L -> 15.0, 9L -> 30.0))
  }

  test("saltedJoin == plain join, and the physical join keys carry the salt") {
    val rnd = new scala.util.Random(3)
    // one hot key (0) with 300 rows — the shape salting exists for
    val big = ((1 to 300).map(_ => 0L) ++ (1 to 200).map(_ => rnd.nextInt(50).toLong))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "payload")
    val small = (0L until 50L).map(k => (k, s"dim$k")).toDF("k", "name")
    val salted = graft.operators.SkewJoin.saltedJoin(big, small, Seq("k"), 4)
    val plain = big.join(small, Seq("k"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
    val keys = salted.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.map(_.toString).getOrElse("")
    }
    assert(keys.exists(_.contains("_salt")), s"join condition lost the salt: $keys")
    // the hot key must actually SPREAD: its 300 rows (distinct payloads)
    // hash to more than one salt value
    val hotSalts = big.withColumn("_salt",
      pmod(hash(big.columns.map(col): _*), lit(4)))
      .filter(col("k") === 0L).select("_salt").distinct().count()
    assert(hotSalts > 1, s"hot key collapsed to $hotSalts salt(s)")
    // a key-only projection yields ONE salt per key (no spread) — rejected
    intercept[IllegalArgumentException] {
      graft.operators.SkewJoin.saltedJoin(big.select("k"), small, Seq("k"), 4)
    }
  }

  test("rangeJoinDays plans as an equi-join on the bucket id, not a nested loop") {
    val ranges = Seq((1L, java.sql.Date.valueOf("2024-01-01"),
      java.sql.Date.valueOf("2024-01-08"))).toDF("rid", "d0", "d1")
    val points = Seq((1L, java.sql.Date.valueOf("2024-01-03"))).toDF("pid", "pd")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so a non-equi join would surface as CartesianProduct /
    // BroadcastNestedLoopJoin rather than being hidden by a tiny-side BHJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = TimeSeriesOps.rangeJoinDays(ranges, "d0", "d1", points, "pd")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"range join fell back to a cross product:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join on the bucket id:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
