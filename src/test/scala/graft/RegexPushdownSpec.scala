package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.Catalog
import graft.plans.RegexPrefixPushdown.literalPrefix

/** The RegexPrefixPushdown optimizer rule: conservative prefix derivation,
  * the derived predicate reaching the parquet source, and semantics
  * preservation on regexes with optional heads. */
class RegexPushdownSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("literalPrefix is conservative") {
    assert(literalPrefix("^priority:[12].*") == Some("priority:"))
    assert(literalPrefix("^abc$") == Some("abc"))
    assert(literalPrefix("priority:.*") == None)    // unanchored
    assert(literalPrefix("^[ab]x") == None)         // metachar first
    assert(literalPrefix("^ab*c") == Some("a"))     // b is optional
    assert(literalPrefix("^ab+c") == Some("a"))     // conservative for + too
    assert(literalPrefix("^ab{2}") == Some("a"))
    assert(literalPrefix("^ab\\d*") == Some("ab"))  // escape ends the literal
    assert(literalPrefix("^a|b") == None)           // '^' may not govern all
    // the FullMatch rendering Keywords.toPredicate emits (review finding,
    // r19: keyword regex filters were promised the pushdown but \A was
    // unrecognized); accepted only in the exact single-group form
    assert(literalPrefix("\\A(?:orderdate-[0-9]+)\\z") == Some("orderdate-"))
    assert(literalPrefix("\\A(?:ab*c)\\z") == Some("a"))
    assert(literalPrefix("\\A(?:a|b)\\z") == None)  // alternation
    assert(literalPrefix("\\A(?:a(b)c)\\z") == None) // nested group: reject
    assert(literalPrefix("^a?x") == None)           // nothing guaranteed
    assert(literalPrefix("^^abc") == None)          // "^^abc" matches "abc"
    assert(literalPrefix("^ab^c") == Some("ab"))    // inner '^' ends literal
  }

  test("a bare rlike filter over the index parquet pushes StringStartsWith") {
    val plan = Catalog.index(spark, "/root/testdata/sf0.001")
      .filter(col("key").rlike("^priority:[12].*"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("StringStartsWith(key,priority:)"),
      s"prefix not pushed to the scan:\n$plan")
  }

  test("rule preserves rlike semantics on optional-head regexes") {
    val data = Seq("ac", "abc", "abbc", "xabc", "a", "c", "zac", "^abc")
      .toDF("key")
    for (re <- Seq("^ab*c", "^a.c", "^abc$", "^ab\\d*", "^^abc")) {
      val got = data.filter(col("key").rlike(re))
        .collect().map(_.getString(0)).toSet
      val want = data.collect().map(_.getString(0))
        .filter(s => java.util.regex.Pattern.compile(re).matcher(s).find())
        .toSet
      assert(got == want, s"regex $re")
    }
  }
}
