package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Bands

/** Percentile-band derivation (ingest/Bands): discrete rank-ceil quantiles
  * over a hand-computed fixture, pinning the (k·n+99) div 100 rank rule. */
class BandsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("deriveDaily picks the value at rank ceil(k*n/100)") {
    // one key-day with n=10 values 1.0..10.0 → ranks: pct5→1, pct25→3,
    // score(50)→5, pct75→8, pct95→10
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")
    val ev = (1 to 10).map(i => (ts, "click", i.toDouble))
      .toDF("ts", "event_type", "value")
    val out = Bands.deriveDaily(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("key") == "event:click")
    assert(r.getAs[Double]("pct5") == 1.0)
    assert(r.getAs[Double]("pct25") == 3.0)
    assert(r.getAs[Double]("score") == 5.0)
    assert(r.getAs[Double]("pct75") == 8.0)
    assert(r.getAs[Double]("pct95") == 10.0)
  }

  test("n=1 group: every band collapses to the single value") {
    val ts = java.sql.Timestamp.valueOf("2024-03-02 00:00:01")
    val ev = Seq((ts, "error", 7.5)).toDF("ts", "event_type", "value")
    val r = Bands.deriveDaily(ev).collect().head
    for (c <- Seq("score", "pct5", "pct25", "pct75", "pct95"))
      assert(r.getAs[Double](c) == 7.5, c)
  }

  test("groups split by day and key; ties collapse to one value") {
    val d1 = java.sql.Timestamp.valueOf("2024-03-01 01:00:00")
    val d2 = java.sql.Timestamp.valueOf("2024-03-02 01:00:00")
    val ev = Seq(
      (d1, "click", 2.0), (d1, "click", 2.0), (d1, "click", 9.0),
      (d1, "view", 4.0),
      (d2, "click", 1.0)).toDF("ts", "event_type", "value")
    val out = Bands.deriveDaily(ev)
    assert(out.count() == 3)
    // n=3 with values [2,2,9]: score rank ceil(150/100)=2 → 2.0; pct95 rank 3 → 9.0
    val r = out.filter(col("key") === "event:click")
      .orderBy("off").collect().head // first day sorts first
    assert(r.getAs[Double]("score") == 2.0)
    assert(r.getAs[Double]("pct95") == 9.0)
  }
}
