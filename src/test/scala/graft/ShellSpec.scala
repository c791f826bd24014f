package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.exec.Presenter
import graft.model.Tables
import graft.parser.Parser

/** End-to-end statement dispatch (statement.cc:12-50): a script of every
  * statement kind through parse → execute → render. */
class ShellSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def fixture: Tables = {
    val index = Seq(
      ("k", 1L, 10.0), ("k", 2L, 20.0),
      ("b", 1L, 0.0), ("b", 2L, 0.0),
      ("c", 3L, 0.0))
      .toDF("key", "off", "score")
    val summaries = Seq(
      (1L, "d1", """{"a":1}"""), (2L, "d2", """{"b":2}"""), (3L, "d3", """{"c":3}"""))
      .toDF("off", "key", "json")
    Tables(index, summaries, Seq.empty[(String, String)].toDF("key", "json"))
  }

  test("script: SET, PARSE, QUERY, KEYS FOR, SELECT, CORRELATE all dispatch") {
    val t = fixture
    val state = new Presenter.SessionState
    val outputs = Parser.parseStatements(
      """SET OUTPUT FORMAT JSON;
        |PARSE 'k' > 15 ORDER BY 'k';
        |QUERY 'k' LIMIT 1;
        |QUERY KEYS FOR 'k' LIMIT -1;
        |SELECT 'k' FROM 'b';
        |CORRELATE QUERY 'b', 'c';
        |""".stripMargin)
      .map(Presenter.execute(spark, t, state, _))

    assert(outputs(0) == "") // SET renders nothing
    assert(outputs(1) == "((k>15) ORDER BY k)")
    assert(outputs(2) == """{"result-count":2,"result":[{"_key":"d2","b":2}]}""")
    assert(outputs(3).split("\n").toSeq == Seq("d2", "d1")) // rank order
    assert(outputs(4).split("\n").toSet == Set("d1,10", "d2,20"))
    // A = b = {1,2}, B = c − A = {3}; prior = ln(3/2). Key 'b' scores
    // ln((2+1)/(0+1)) − prior = 0.693, a pure A signal.
    val correlate = outputs(5).split("\n").filter(_.nonEmpty)
    assert(correlate.exists(l => l.endsWith("\tb") && l.startsWith("0.693")))
  }

  test("parse errors surface as error envelopes via Shell's catch") {
    assertThrows[Parser.ParseError] {
      Parser.parseStatements("QUERY ((broken;")
    }
  }

  test("leading UTF-8 BOM is tolerated (query-parser.yy bom rule)") {
    val stmts = Parser.parseStatements("\uFEFF" + "PARSE 'k';")
    assert(stmts.length == 1)
  }

  test("error envelope escapes quotes, backslashes and newlines") {
    // ADVICE r3: unescaped e.getMessage produced malformed JSON
    assert(Presenter.errorEnvelope("bad \"token\"\nat line 1\\") ==
      """{"error":"bad \"token\"\nat line 1\\"}""")
    assert(Presenter.errorEnvelope(null) == """{"error":"null"}""")
  }

  test("REPL loop: per-line execution, bad line continues, EOF exits") {
    // ca-shell.cc:163-199 — one statement per line, a failing line prints
    // its envelope (parse errors included) and the next line still runs
    val state = new Presenter.SessionState
    val in = new java.io.BufferedReader(new java.io.StringReader(
      "QUERY 'k' LIMIT 1;\n" +
        "\n" + // empty line skipped
        "QUERY ((broken;\n" +
        "PARSE 'k' > 15;\n"))
    val buf = new java.io.ByteArrayOutputStream
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      Shell.repl(spark, fixture, state, in)
    }
    val lines = buf.toString("UTF-8").split("\n").filter(_.nonEmpty).toSeq
    assert(lines.head == """{"result-count":2,"result":[{"_key":"d2","b":2}]}""")
    assert(lines(1).startsWith("""{"error":"""")) // bad line → envelope
    assert(lines(2) == "(k>15)") // loop survived the error
  }

  test("SELECT CSV rows come back in selection offset order") {
    val state = new Presenter.SessionState
    val out = Presenter.execute(spark, fixture, state,
      Parser.parseStatements("SELECT 'k' FROM 'b';").head)
    assert(out.split("\n").toSeq == Seq("d1,10", "d2,20")) // off 1 before 2
  }
}
