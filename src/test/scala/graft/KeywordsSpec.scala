package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Keywords

/** Keyword classification filters (keywords.cc:20-68): `/re/` entries are
  * FULL-match regexes, everything else a literal prefix; config parses the
  * reference's keywords.yaml shape. */
class KeywordsSpec extends AnyFunSuite {

  test("prefix filters match by prefix only") {
    val f = Keywords.parseFilter("orderdate")
    assert(f.matches("orderdate"))
    assert(f.matches("orderdate:extra"))
    assert(!f.matches("xorderdate"))
  }

  test("slash-wrapped filters are full-match regexes (keywords.cc:66-68)") {
    val f = Keywords.parseFilter("/date-[0-9]+/")
    assert(f.matches("date-123"))
    assert(!f.matches("date-123-suffix")) // FullMatch, not partial
    assert(!f.matches("xdate-123"))
  }

  test("config parser: sections, quoted and bare entries, comments") {
    val (eph, ts) = Keywords.parseConfig(
      """# keyword classes
        |ephemeral:
        |  - "session:"
        |  - /tmp-[a-z]+/
        |timestamped:
        |  - shipdate   # trailing comment
        |""".stripMargin)
    assert(eph.exists(_.matches("session:abc")))
    assert(eph.exists(_.matches("tmp-xyz")))
    assert(!eph.exists(_.matches("tmp-xyz2"))) // full match
    assert(ts.exists(_.matches("shipdate")))
    assert(ts.size == 1 && eph.size == 2)
  }

  test("a BARE list entry ending in ':' is a prefix filter, not a section " +
      "header (review finding, r19: `- event:` was misparsed as a header, " +
      "dropping it and rerouting every later entry)") {
    val (eph, ts) = Keywords.parseConfig(
      """ephemeral:
        |  - event:
        |  - "session:"
        |timestamped:
        |  - shipdate
        |""".stripMargin)
    assert(eph.exists(_.matches("event:login")),
      "the bare 'event:' prefix entry must be kept")
    assert(eph.exists(_.matches("session:abc")),
      "entries AFTER the colon-bearing one must stay in their section")
    assert(ts.exists(_.matches("shipdate")))
    assert(eph.size == 2 && ts.size == 1)
  }

  test("GRAFT_KEYWORDS file round-trip pins classification semantics") {
    // write the reference config shape (keywords.cc:28-68) to disk and load
    // it through the same path the GRAFT_KEYWORDS env init takes
    val f = java.nio.file.Files.createTempFile("graft-keywords", ".yaml")
    try {
      java.nio.file.Files.write(f,
        """# reference keywords.yaml shape
          |ephemeral:
          |  - "event:"
          |  - /sess-[0-9a-f]+/
          |timestamped:
          |  - orderdate
          |  - shipdate     # prefix, not full match
          |""".stripMargin.getBytes("UTF-8"))
      val (eph, ts) = Keywords.loadConfig(f.toString)
      // prefix entries match by prefix (keywords.cc:34-35)
      assert(ts.exists(_.matches("shipdate")))
      assert(ts.exists(_.matches("shipdate:2024")))
      assert(!ts.exists(_.matches("xshipdate")))
      // /re/ entries are RE2::FullMatch (keywords.cc:66-68)
      assert(eph.exists(_.matches("sess-0af3")))
      assert(!eph.exists(_.matches("sess-0af3-tail")))
      assert(eph.exists(_.matches("event:login")))
      assert(!ts.exists(_.matches("event:login")) && eph.size == 2 && ts.size == 2)
    } finally java.nio.file.Files.delete(f)
  }

  test("column predicates agree with scalar classification over a key table") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val keys = Seq("orderdate", "orderdate:x", "shipdate", "event:click",
      "event:", "price", "xorderdate", "evt").toDF("key")
    val gotTs = keys.filter(Keywords.timestampedCol(col("key")))
      .collect().map(_.getString(0)).toSet
    val gotEph = keys.filter(Keywords.ephemeralCol(col("key")))
      .collect().map(_.getString(0)).toSet
    val all = Seq("orderdate", "orderdate:x", "shipdate", "event:click",
      "event:", "price", "xorderdate", "evt")
    assert(gotTs == all.filter(Keywords.isTimestamped).toSet)
    assert(gotEph == all.filter(Keywords.isEphemeral).toSet)
  }

  test("column regex predicate is FullMatch even with a trailing newline") {
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Matcher.matches() must consume the \n; ^...$ anchoring would match
    // BEFORE the trailing line terminator and classify the two paths apart
    val (eph, _) = Keywords.parseConfig(
      "ephemeral:\n  - /sess-[0-9a-f]+/\n")
    assert(!eph.exists(_.matches("sess-0af3\n")))
    val colHit = Seq("sess-0af3\n", "sess-0af3").toDF("key")
      .filter(Keywords.toPredicate(eph, col("key")))
      .collect().map(_.getString(0)).toSeq
    assert(colHit == Seq("sess-0af3")) // newline-bearing key excluded
  }

  test("default classes mirror the testdata fixtures") {
    assert(Keywords.isTimestamped("orderdate"))
    assert(Keywords.isTimestamped("shipdate"))
    assert(Keywords.isEphemeral("event:click"))
    assert(!Keywords.isTimestamped("price"))
    assert(!Keywords.isEphemeral("price"))
  }
}
