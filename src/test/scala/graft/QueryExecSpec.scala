package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.ast._
import graft.compiler.QueryCompiler
import graft.exec.{Presenter, QueryExec, SelectExec}
import graft.model.Tables
import graft.parser.Parser

/** Statement-executor tests on a hand-built in-memory catalog — semantics
  * pinned against hand-computed expectations (thresholds query.cc:749-793,
  * headers :900-928, overrides :877-890, S4 :228-305, SELECT select.cc:34-71).
  */
class QueryExecSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def fixture: Tables = {
    val index = Seq(
      ("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 30.0),
      ("m", 2L, 5.0), ("m", 3L, 7.0),
      ("b", 1L, 0.0), ("b", 3L, 0.0), // boolean (all-zero) keyword
      ("name:example.com", 1L, 1.0), ("name:foo.org", 2L, 1.0)
    ).toDF("key", "off", "score")
    val summaries = Seq(
      (1L, "d1", """{"a":1}"""), (2L, "d2", """{"b":2}"""), (3L, "d3", """{"c":3}"""))
      .toDF("off", "key", "json")
    val overrides = Seq(("d2", """{"x":9}""")).toDF("key", "json")
    val blobs = Seq(("b1", "see www.example.com then {Section One} foo.org!"))
      .toDF("key", "data")
    Tables(index, summaries, overrides, Some(blobs))
  }

  test("bucket table: ordinals, headers, reversal, date headers") {
    val bs = QueryExec.buckets(List(1.0, 5.0, 10.0), reversed = false, dateHeaders = false)
    assert(bs.map(_.header) == Seq("1–5", "5–10"))
    assert(bs.map(_.headerKey) == Seq("AAAAB", "AAAAC"))
    val rev = QueryExec.buckets(List(1.0, 5.0, 10.0), reversed = true, dateHeaders = false)
    assert(rev.map(_.headerKey) == Seq("AAAAC", "AAAAB"))
    // one-day bucket renders a single date (query.cc:908-914)
    val d = QueryExec.buckets(List(9131.0, 9132.0), reversed = false, dateHeaders = true)
    assert(d.map(_.header) == Seq("January 1, 1995"))
    assert(QueryExec.base26(0) == "AAAAA")
    assert(QueryExec.base26(27) == "AAABB")
  }

  test("threshold join replaces score and filters to [min, max)") {
    // results from 'b' (offsets 1,3); thresholds over 'k' scores: 10 in
    // [10,30) keeps offset 1 with score 10; offset 3 has k=30, outside.
    val df = QueryExec.runPage(spark, fixture,
      "QUERY 'b' THRESHOLDS 10, 30 FOR KEY 'k' LIMIT -1;")
    val rows = df.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getString(2), r.getString(3)))
    assert(rows.toSeq == Seq((1L, 10.0, "10–30", "AAAAB")))
  }

  test("single threshold value yields empty result") {
    assert(QueryExec.runPage(spark, fixture,
      "QUERY 'k' THRESHOLDS 10 FOR KEY 'k' LIMIT -1;").count() == 0)
  }

  test("rows() on a single-value THRESHOLDS list is empty, not a crash") {
    // ADVICE r3: the header when-chain called bs.head on an empty bucket Seq
    val df = QueryExec.runRows(spark, fixture,
      "QUERY 'k' THRESHOLDS 10 FOR KEY 'k' LIMIT -1;")
    assert(df.count() == 0)
    assert(df.columns.contains("_header")) // schema matches populated case
    // and the full envelope path (Presenter.queryJson) renders it
    val stmt = Parser.parseStatement(
      "QUERY 'k' THRESHOLDS 10 FOR KEY 'k' LIMIT -1;").asInstanceOf[QueryStmt]
    // reference quirk replicated: empty result renders [{}] (query.cc:930-941)
    assert(Presenter.queryJson(spark, fixture, stmt) ==
      """{"result-count":0,"result":[{}]}""")
  }

  test("LIMIT 0 and OFFSET past the result set yield empty pages") {
    assert(QueryExec.runPage(spark, fixture, "QUERY 'k' LIMIT 0;").count() == 0)
    assert(QueryExec.runPage(spark, fixture,
      "QUERY 'k' LIMIT 5 OFFSET 100;").count() == 0) // query.cc:795-798
  }

  test("override overlay merges JSON for overridden keys only") {
    val rows = QueryExec.runRows(spark, fixture, "QUERY 'k' LIMIT -1;")
      .collect().map(r => (r.getAs[String]("key"), r.getAs[String]("json"))).toMap
    assert(rows("d1") == """{"a":1}""")
    assert(rows("d2") == """{"b":2,"x":9}""") // merged (query.cc:877-890)
  }

  test("keys-only returns document keys of the page in rank order") {
    val ks = QueryExec.runPage(spark, fixture, "QUERY KEYS FOR 'k' LIMIT 2;")
      .collect().map(_.getString(0)).toSet
    assert(ks == Set("d3", "d2")) // top-2 by score 30, 20
  }

  test("S4 CAS expansion resolves blob names and attaches headers") {
    val c = new QueryCompiler(spark, fixture)
    val compiled = c.compile(Leaf("name-in:b1"))
    val offs = compiled.postings.collect().map(_.getLong(0)).toSet
    assert(offs == Set(1L, 2L)) // example.com → off 1, foo.org → off 2
    val extra = compiled.extra.get.collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // example.com precedes the {Section One} header; foo.org follows it
    assert(extra == Map(2L -> "Section One"))
  }

  test("S4 without a blob table fails loudly") {
    val noBlobs = fixture.copy(blobs = None)
    assertThrows[IllegalStateException] {
      new QueryCompiler(spark, noBlobs).compile(Leaf("name-in:b1"))
    }
  }

  test("JSON envelope: result-count, _key, summary body, override body") {
    val stmt = Parser.parseStatement("QUERY 'k' LIMIT 2;")
      .asInstanceOf[QueryStmt]
    val json = Presenter.queryJson(spark, fixture, stmt)
    assert(json ==
      """{"result-count":3,"result":[{"_key":"d3","c":3},""" + "\n" +
        """{"_key":"d2","b":2,"x":9}]}""")
  }

  test("JSON envelope renders percentile bands as the ca-dump value string") {
    // band-carrying index (ca-table.h:102-105); key 'priceband' is the
    // statically-classified banded family (Keywords.hasPctBands)
    val index = Seq(
      ("priceband", 1L, 20.0, 17.0, 19.0, 21.0, 23.0),
      ("priceband", 2L, 10.0, 8.5, 9.5, 10.5, 11.5))
      .toDF("key", "off", "score", "pct5", "pct25", "pct75", "pct95")
    val t = fixture.copy(index = index)
    val stmt = Parser.parseStatement("QUERY 'priceband' LIMIT 2;")
      .asInstanceOf[QueryStmt]
    // _score = score + four pcts, space-joined %.9g (ca-dump.cc:168-199)
    assert(Presenter.queryJson(spark, t, stmt) ==
      """{"result-count":2,"result":[{"_key":"d1","a":1,"_score":"20 17 19 21 23"},""" + "\n" +
        """{"_key":"d2","b":2,"x":9,"_score":"10 8.5 9.5 10.5 11.5"}]}""")
  }

  test("dedupMax carries the winning row's bands") {
    val df = Seq((1L, 5.0, 4.0, 4.5, 5.5, 6.0), (1L, 9.0, 8.0, 8.5, 9.5, 10.0))
      .toDF("off", "score", "pct5", "pct25", "pct75", "pct95")
    val out = graft.operators.PostingAlgebra.dedupMax(df).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getDouble(1), r.getDouble(2), r.getDouble(5)) == ((9.0, 8.0, 10.0)))
  }

  test("JSON envelope with thresholds: _header/_header_key per row") {
    val stmt = Parser.parseStatement(
      "QUERY 'b' THRESHOLDS 10, 30 FOR KEY 'k' LIMIT -1;").asInstanceOf[QueryStmt]
    assert(Presenter.queryJson(spark, fixture, stmt) ==
      """{"result-count":1,"result":[{"_key":"d1","a":1,"_header":"10–30","_header_key":"AAAAB"}]}""")
  }

  test("SELECT: NaN-missing, all-zero→1.0 presence, min-score value") {
    val stmt = Parser.parseStatement("SELECT 'm', 'b' FROM 'k';")
      .asInstanceOf[SelectStmt]
    val rows = SelectExec.run(spark, fixture, stmt).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toList
      .sortBy(_._1)
    assert(rows.map(_._1) == List("d1", "d2", "d3"))
    val byKey = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byKey("d1")._1.isNaN) // no 'm' posting at off 1
    assert(byKey("d2")._1 == 5.0)
    assert(byKey("d3")._1 == 7.0)
    assert(byKey("d1")._2 == 1.0) // 'b' is all-zero → presence = 1.0
    assert(byKey("d2")._2.isNaN) // off 2 not in 'b'
    assert(byKey("d3")._2 == 1.0)
  }

  test("SELECT CSV presenter renders %.9g values and nan") {
    val stmt = Parser.parseStatement("SELECT 'm' FROM 'k' WITH SUMMARIES;")
      .asInstanceOf[SelectStmt]
    val csv = Presenter.selectCsv(spark, fixture, stmt).split("\n").toSet
    assert(csv == Set(
      "d1,nan,\"{\"\"a\"\":1}\"",
      "d2,5,\"{\"\"b\"\":2}\"",
      "d3,7,\"{\"\"c\"\":3}\""))
  }
}
