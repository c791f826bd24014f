package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ml.Sketches

class SketchesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def events(n: Int, types: Int, users: Int) =
    (0 until n).map { i =>
      (s"t${i % types}", (i * 7919) % users)
    }.toDF("event_type", "user_id")

  test("KMV merge law: union of per-split min-k sets contains the global " +
    "min-k, so split-then-merge == whole-corpus sketch") {
    val df = events(4000, 3, 900)
    val whole = Sketches.kmvDistinct(df).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getLong(3)))
      .toMap
    // split on a hash of user_id — both halves see every event_type
    val a = df.filter(pmod(col("user_id"), lit(2)) === 0)
    val b = df.filter(pmod(col("user_id"), lit(2)) =!= 0)
    // merge = min-k over the union of the two sketches' kept hashes; the
    // kept hashes are exactly rows of the pre-agg frame, so re-running
    // kmvDistinct on the union of kept (type, h) pairs is the merge
    val keptOf = (d: org.apache.spark.sql.DataFrame) => d
      .select(col("event_type"),
        conv(substring(md5(concat(lit("kmv:"),
          col("user_id").cast("string"))), 1, 12), 16, 10)
          .cast("long").as("h"))
      .distinct()
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= Sketches.KmvK)
      .select("event_type", "h")
    val merged = keptOf(a).union(keptOf(b))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= Sketches.KmvK)
      .groupBy("event_type")
      .agg(max("rn").as("n_kept"), max("h").as("kth_hash"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(merged.keySet == whole.keySet)
    for ((t, (nk, kh, _)) <- whole)
      assert(merged(t) == ((nk, kh)),
        s"merged sketch for $t diverged from whole-corpus sketch")
  }

  test("KMV estimate: exact below k, within 30% relative error above it") {
    // 40 distinct users in one type (< k=64 → exact), 800 in the other
    val small = (0 until 400).map(i => ("few", i % 40))
    val big = (0 until 4000).map(i => ("many", 1000 + i % 800))
    val out = Sketches.kmvDistinct((small ++ big).toDF("event_type", "user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out("few") == 40L)
    assert(math.abs(out("many") - 800.0) / 800.0 < 0.30,
      s"KMV estimate ${out("many")} too far from 800")
  }

  test("HLL merge law: registers max-merge across splits == whole sketch, " +
    "and the estimate is within 20% on 800 distinct") {
    val df = events(4000, 1, 800)
    val whole = Sketches.hllDistinct(df).collect().head
    // genuine register-level merge: per-split sketches, max-merged
    val ra = Sketches.hllRegisters(df.filter(pmod(col("user_id"), lit(2)) === 0))
    val rb = Sketches.hllRegisters(df.filter(pmod(col("user_id"), lit(2)) =!= 0))
    val merged = Sketches.hllFold(
      ra.union(rb).groupBy("event_type", "reg").agg(max("mr").as("mr")))
      .collect().head
    assert(whole.getDouble(2) == merged.getDouble(2))
    assert(math.abs(whole.getDouble(2) - 800.0) / 800.0 < 0.20,
      s"HLL estimate ${whole.getDouble(2)} too far from 800")
  }

  test("HLL harmonic sum is exact: estimate invariant under repartition") {
    val df = events(3000, 2, 500)
    val e1 = Sketches.hllDistinct(df.repartition(1)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val e32 = Sketches.hllDistinct(df.repartition(32)).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(e1 == e32)
  }

  test("CMS never underestimates, and unique-hash tokens are exact") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "beta beta delta"),
      (3L, "alpha epsilon zeta eta theta")).toDF("doc_id", "text")
    val out = Sketches.cmsHeavyHitters(docs, 40).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    for ((tok, freq, est) <- out)
      assert(est >= freq, s"CMS underestimated $tok: $est < $freq")
    // 8 distinct tokens in 4x512 cells: collisions essentially impossible,
    // every estimate is exact — the audit column earns its keep on real data
    assert(out.forall { case (_, f, e) => e == f })
  }

  test("error gate: KMV within 35% and HLL within 20% of exact on a " +
    "400-distinct-per-type fixture (the sketch-tier recall-gate floor)") {
    val df = events(6000, 2, 800) // interleaving → 400 distinct per type
    val rows = Sketches.errorGate(df).collect()
    assert(rows.length == 2)
    for (r <- rows) {
      assert(r.getLong(1) == 400L, s"fixture drifted: $r")
      assert(r.getDouble(3) < 0.35, s"KMV error too high: $r")
      assert(r.getDouble(5) < 0.20, s"HLL error too high: $r")
    }
  }

  test("rolling HLL tracks the exact rolling distinct on the same dense " +
    "grid: identical day span, zero-fill agreement, error within 20%") {
    import java.sql.Timestamp
    val rows = (0 until 2000).map { i =>
      val day = i % 10
      // days 0-9, user pool rotates so windows overlap partially
      (new Timestamp(86400000L * day + 3600000L), (i * 13) % 500)
    }.toDF("ts", "user_id")
    val exact = graft.operators.EventAnalytics
      .rollingActiveUsers(rows, 7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = Sketches.hllRolling(rows, 7).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(est.map(_._1).toSet == exact.keySet,
      "sketch and exact must cover the identical dense day grid")
    for ((d, _, e) <- est) {
      val t = exact(d)
      if (t == 0L) assert(e == 0.0, s"day $d: zero-fill diverged")
      else assert(math.abs(e - t) / t < 0.20, s"day $d: est $e vs exact $t")
    }
  }

  test("KMV set ops: subset relation is detected exactly at sketch level, " +
    "estimates track truth, and the plan is TakeOrdered (never a global sort)") {
    // B ⊂ A: 60 of A's 300 users. Both fit... A doesn't fit in k=64, B does.
    val a = (0 until 3000).map(i => Tuple1(i % 300)).toDF("user_id")
    val b = (0 until 600).map(i => Tuple1(i % 60)).toDF("user_id")
    val df = Sketches.kmvSetOps(a, b)
    val r = df.collect().head
    val (nKept, interCnt, estUnion, estInter) =
      (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))
    assert(nKept == Sketches.KmvK.toLong)
    // B ⊂ A ⇒ union = A: every union min-k hash that belongs to B's
    // sketch must also belong to A's
    assert(interCnt <= nKept)
    assert(math.abs(estUnion - 300.0) / 300.0 < 0.35,
      s"union estimate $estUnion too far from 300")
    // intersection truth = 60; ratio estimator is coarser — sanity band
    assert(estInter > 0 && estInter < 300, s"intersection estimate $estInter")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"min-k must run as TakeOrdered, not a global sort:\n$plan")
  }

  test("kmv plan: the rank filter rewrites into WindowGroupLimit " +
    "(per-partition min-k, the merge step, happens before the shuffle)") {
    val df = events(1000, 2, 300)
    val plan = Sketches.kmvDistinct(df).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  private def valued(rows: Seq[(String, Double)]) =
    rows.toDF("event_type", "value")

  test("HDR merge law: summed per-split grids == whole grid, and the " +
    "quantile fold over the merged grid == whole-corpus report") {
    val rows = (0 until 3000).map(i =>
      (s"t${i % 2}", ((i * 7919) % 40000 + 1) / 100.0))
    val df = valued(rows)
    val whole = Sketches.hdrGrid(df).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val a = Sketches.hdrGrid(valued(rows.zipWithIndex
      .collect { case (r, i) if i % 2 == 0 => r }))
    val b = Sketches.hdrGrid(valued(rows.zipWithIndex
      .collect { case (r, i) if i % 2 == 1 => r }))
    val merged = a.unionByName(b)
      .groupBy("event_type", "shift", "w")
      .agg(sum("cnt").as("cnt"))
    val mergedMap = merged.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(mergedMap == whole, "count-addition must BE the sketch merge")
    val rep = Sketches.hdrQuantilesFrom(merged).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val repWhole = Sketches.hdrReport(df).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(rep == repWhole)
  }

  test("HDR input contract: NULL values propagate as absent (grid counts " +
    "only real measures); a negative value fails loudly, not silently") {
    val withNull = Seq(("t0", java.lang.Double.valueOf(1.23)),
        ("t0", null.asInstanceOf[java.lang.Double]),
        ("t0", java.lang.Double.valueOf(1.23)))
      .toDF("event_type", "value")
    val g = Sketches.hdrGrid(withNull).collect()
    assert(g.map(_.getLong(3)).sum == 2L,
      s"NULL must contribute nothing, got ${g.mkString(", ")}")
    val neg = intercept[Exception] {
      Sketches.hdrGrid(valued(Seq("t0" -> -0.01))).collect()
    }
    assert(neg.getMessage != null &&
      (neg.getMessage.contains("negative value") ||
        Option(neg.getCause).exists(_.getMessage.contains("negative value"))),
      s"negative input must trip the hdrGrid guard: $neg")
  }

  test("HDR rolling: every anchor equals the from-scratch sketch of its " +
    "trailing window's raw values, and gap anchors zero-fill") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(
      java.time.LocalDate.of(1970, 1, 1).plusDays(d).atStartOfDay())
    val rows = Seq(0 -> Seq(1.00, 2.00, 3.00), 3 -> Seq(5.00))
      .flatMap { case (d, vs) => vs.map(v => ("t", ts(d), v)) }
      .toDF("event_type", "ts", "value")
    val got = Sketches.hdrRolling(rows, days = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    def ref(vals: Seq[Double]) = {
      val cents = vals.map(v => math.round(v * 100)).sorted
      def est(k: Int): Long = if (cents.isEmpty) 0L else {
        val rank = math.max(1L, (k.toLong * cents.size + 99) / 100)
        val v = cents(rank.toInt - 1)
        val m = if (v == 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(v)
        val sh = math.max(m - (Sketches.HdrSubBits + 1), 0)
        (v >> sh) << sh
      }
      (cents.size.toLong, est(50), est(95), est(99))
    }
    // days=2: anchor d merges the grids of days d-1 and d
    assert(got(0L) == ref(Seq(1.0, 2.0, 3.0)))
    assert(got(1L) == ref(Seq(1.0, 2.0, 3.0)))
    assert(got(2L) == ((0L, 0L, 0L, 0L)), "empty window must zero-fill")
    assert(got(3L) == ref(Seq(5.0)))
    assert(got.keySet == Set(0L, 1L, 2L, 3L), "dense over the span")
  }

  test("HDR error law: estimates never exceed the exact discrete quantile " +
    "and stay within 2^-4 relative error; sub-32-cent values are exact") {
    val rows = (0 until 5000).map(i =>
      ("big", ((i * 104729) % 3000000 + 50) / 100.0)) ++
      (0 until 500).map(i => ("small", ((i * 31) % 30 + 1) / 100.0))
    val got = Sketches.hdrErrorGate(valued(rows)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    for ((t, (exact, est, err)) <- got) {
      assert(est <= exact, s"$t: sketch lower bound above the exact value")
      assert(err >= 0.0 && err <= 1.0 / 16 + 1e-9,
        s"$t: rel_err $err outside the bucket law's 2^-4 bound")
    }
    // every "small" value has fewer than 6 significant bits → shift 0 →
    // the sketch IS the exact multiset
    assert(got("small")._3 == 0.0, s"sub-32-cent quantiles must be exact")
  }
}
