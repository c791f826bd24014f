package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.TsvLoader
import graft.sources.Dump

class DumpSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("literalPrefix extracts the anchored literal head") {
    assert(Dump.literalPrefix("^priority:[12].*") == Some("priority:"))
    assert(Dump.literalPrefix("^abc$") == Some("abc"))
    assert(Dump.literalPrefix("priority:.*") == None) // unanchored
    assert(Dump.literalPrefix("^[ab]x") == None) // metachar first
  }

  test("indexRaw: prefix conjunct does not change the matched set") {
    val idx = Seq(("priority:1-URGENT", 1L, 0.0), ("priority:3-MEDIUM", 2L, 0.0),
      ("price", 3L, 5.0)).toDF("key", "off", "score")
    val rows = Dump.indexRaw(idx, "^priority:[12].*").collect()
      .map(_.getString(0)).toSet
    assert(rows == Set("priority:1-URGENT"))
  }

  test("timeSeries renders epoch-second offsets with the time format") {
    val p = Seq(("cpu", 1577934245L, 0.5)).toDF("key", "off", "score")
    val r = Dump.timeSeries(p).collect().head
    assert(r.getString(1) == "2020-01-02 03:04:05")
  }

  test("percentile bands pass through dumps when present (ca-dump.cc:168-199)") {
    val withPct = Seq(("k", 10L, 1.0, 0.9, 0.95, 1.05, 1.1))
      .toDF("key", "off", "score", "pct5", "pct25", "pct75", "pct95")
    assert(Dump.indexRaw(withPct, "^k").columns.toSeq ==
      Seq("key", "off", "score", "pct5", "pct25", "pct75", "pct95"))
    assert(Dump.timeSeries(withPct).columns.toSeq ==
      Seq("key", "t", "score", "pct5", "pct25", "pct75", "pct95"))
    // bandless tables keep the plain 3-column shape
    val plain = Seq(("k", 10L, 1.0)).toDF("key", "off", "score")
    assert(Dump.indexRaw(plain, "^k").columns.toSeq == Seq("key", "off", "score"))
  }

  test("C2 escape/unescape round-trips") {
    val nasty = "a\tb\nc\rd\\e"
    assert(TsvLoader.unescape(TsvLoader.escape(nasty)) == nasty)
    assert(TsvLoader.escape("a\tb") == "a\\tb")
  }
}
