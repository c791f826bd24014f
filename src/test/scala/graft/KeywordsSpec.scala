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

  test("default classes mirror the testdata fixtures") {
    assert(Keywords.isTimestamped("orderdate"))
    assert(Keywords.isTimestamped("shipdate"))
    assert(Keywords.isEphemeral("event:click"))
    assert(!Keywords.isTimestamped("price"))
    assert(!Keywords.isEphemeral("price"))
  }
}
