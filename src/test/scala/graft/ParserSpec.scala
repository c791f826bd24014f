package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ast._
import graft.parser.{Lexer, Parser, Printer}

/** Parser conformance against the reference grammar
  * (/root/reference/src/query-parser.yy:98-535, lexer query-lexer.ll:58-115). */
class ParserSpec extends AnyFunSuite {

  private def q(s: String): Query = Parser.parseQuery(s)

  test("leaf and quoted leaf") {
    assert(q("price") == Leaf("price"))
    assert(q("'status:F'") == Leaf("status:F"))
    assert(q("\"status:F\"") == Leaf("status:F"))
  }

  test("KEY= doc lookup") {
    assert(q("KEY=order:42") == DocKey("order:42"))
    assert(Parser.parseStatement("QUERY KEY=order:42 LIMIT 5;") ==
      QueryStmt(false, DocKey("order:42"), None, 5, 0))
  }

  test("connectives are one left-associative level (yy:95)") {
    assert(q("a OR b AND c") ==
      Bin(BinKind.And, Bin(BinKind.Or, Leaf("a"), Leaf("b")), Leaf("c")))
    assert(q("a + b - c") ==
      Bin(BinKind.Subtract, Bin(BinKind.Or, Leaf("a"), Leaf("b")), Leaf("c")))
    assert(q("a AND NOT b") == Bin(BinKind.Subtract, Leaf("a"), Leaf("b")))
  }

  test("juxtaposition is AND (yy:415-427)") {
    assert(q("a b c") ==
      Bin(BinKind.And, Bin(BinKind.And, Leaf("a"), Leaf("b")), Leaf("c")))
  }

  test("ORDER BY binds at the same level with list lhs (yy:353-362)") {
    assert(q("a AND b ORDER BY c") ==
      Bin(BinKind.OrderBy, Bin(BinKind.And, Leaf("a"), Leaf("b")), Leaf("c")))
  }

  test("scalar comparisons incl. two-token >= (yy:272-321)") {
    assert(q("a > 5") == CmpScalar(CmpOp.Gt, Leaf("a"), 5.0))
    assert(q("a >= 5") == CmpScalar(CmpOp.Ge, Leaf("a"), 5.0))
    assert(q("a > = 5") == CmpScalar(CmpOp.Ge, Leaf("a"), 5.0))
    assert(q("a <= 2.5") == CmpScalar(CmpOp.Le, Leaf("a"), 2.5))
    assert(q("a = -3") == CmpScalar(CmpOp.Eq, Leaf("a"), -3.0))
  }

  test("theta compare with query rhs (yy:322-341)") {
    assert(q("a > b") == CmpQuery(CmpOp.Gt, Leaf("a"), Leaf("b")))
    assert(q("a < MAX(b)") ==
      CmpQuery(CmpOp.Lt, Leaf("a"), Un(UnKind.Max, Leaf("b"))))
  }

  test("range with auto-order preserved to AST (yy:342-352)") {
    assert(q("a [1, 10]") == InRange(Leaf("a"), 1.0, 10.0))
    assert(q("a [10, 1]") == InRange(Leaf("a"), 10.0, 1.0))
  }

  test("date literals are days since epoch (yy:204-210)") {
    assert(q("a > 1970-01-02") == CmpScalar(CmpOp.Gt, Leaf("a"), 1.0))
    assert(q("d [1995-01-01, 1995-12-31]") ==
      InRange(Leaf("d"), 9131.0, 9495.0))
  }

  test("hex integers (ll:101)") {
    assert(q("a = 0x10") == CmpScalar(CmpOp.Eq, Leaf("a"), 16.0))
  }

  test("unary MAX/MIN/negate and RANDOM_SAMPLE") {
    assert(q("MAX(a)") == Un(UnKind.Max, Leaf("a")))
    assert(q("MIN(a OR b)") == Un(UnKind.Min, Bin(BinKind.Or, Leaf("a"), Leaf("b"))))
    assert(q("~a") == Un(UnKind.Negate, Leaf("a")))
    assert(q("RANDOM_SAMPLE(a, 100)") == Sample(Leaf("a"), 100))
  }

  test("QUERY statement with thresholds, limit, offset (yy:119-135,454-531)") {
    val s = Parser.parseStatement(
      "QUERY ('status:F' AND 'price' > 150000 ORDER BY 'price') " +
        "THRESHOLDS 1,2.5,10 FOR KEY 'price' LIMIT 10 OFFSET 5 ROWS;")
    assert(s == QueryStmt(
      keysOnly = false,
      Bin(BinKind.OrderBy,
        Bin(BinKind.And, Leaf("status:F"),
          CmpScalar(CmpOp.Gt, Leaf("price"), 150000.0)),
        Leaf("price")),
      Some(Thresholds("price", List(1.0, 2.5, 10.0))), 10, 5))
  }

  test("QUERY KEYS FOR and FETCH FIRST n ROWS ONLY") {
    assert(Parser.parseStatement("QUERY KEYS FOR (a) FETCH FIRST 3 ROWS ONLY;") ==
      QueryStmt(keysOnly = true, Leaf("a"), None, 3, 0))
  }

  test("CORRELATE / PARSE / SELECT / SET statements") {
    assert(Parser.parseStatement("CORRELATE QUERY (a), (b AND c);") ==
      CorrelateStmt(Leaf("a"), Bin(BinKind.And, Leaf("b"), Leaf("c"))))
    assert(Parser.parseStatement("PARSE a OR b;") ==
      ParseStmt(Bin(BinKind.Or, Leaf("a"), Leaf("b"))))
    assert(Parser.parseStatement("SELECT PARALLEL 4 f1, f2 AND g FROM (sel) WITH SUMMARIES;") ==
      SelectStmt(List(Leaf("f1"), Bin(BinKind.And, Leaf("f2"), Leaf("g"))),
        Leaf("sel"), withSummaries = true, parallel = 4))
    assert(Parser.parseStatement("SET OUTPUT FORMAT CSV;") == SetOutputFormat(OutputFormat.Csv))
    assert(Parser.parseStatement("SET TIME FORMAT '%Y-%m-%d';") == SetTimeFormat("%Y-%m-%d"))
  }

  test("comments and case-insensitive keywords (ll:59-60)") {
    assert(Parser.parseStatements("query (a) limit 1; -- tail\n/* block */ parse b;").length == 2)
  }

  test("keywords are only reserved as whole words") {
    assert(q("orderdate") == Leaf("orderdate"))  // starts with 'order'
    assert(q("order") == Leaf("order"))          // ORDER only exists fused with BY
    assert(q("maxi AND minmax") == Bin(BinKind.And, Leaf("maxi"), Leaf("minmax")))
  }

  test("print/parse round-trip") {
    val samples = Seq(
      "price",
      "(a + b)",
      "((a AND b) - c)",
      "(a ORDER BY MAX(b))",
      "(a>5)", "(a>=5)", "(a<2.5)", "(a[1,10])",
      "~(a)", "MIN((a + b))", "RANDOM_SAMPLE(a, 100)",
      "KEY=order:42",
      "((a>b) AND (c<d))")
    for (s <- samples) {
      val ast = q(s)
      assert(Parser.parseQuery(Printer.print(ast)) == ast, s"round-trip of $s")
    }
  }

  test("%.9g printing") {
    assert(Printer.g9(5.0) == "5")
    assert(Printer.g9(2.5) == "2.5")
    assert(Printer.g9(150000.0) == "150000")
    assert(Printer.g9(0.000125) == "0.000125")
    assert(Printer.g9(123456789.0) == "123456789")
    assert(Printer.g9(1234567891.0) == "1.23456789e+09")
    assert(Printer.g9(1.0 / 3.0) == "0.333333333")
  }

  test("lexer: date vs subtraction disambiguation (ll:101-104)") {
    import Lexer._
    assert(lex("1995-03-02") == Vector(DateLit("1995-03-02"), EOF))
    assert(lex("123-456") == Vector(IntLit(123), IntLit(-456), EOF))
    assert(lex("a - b") == Vector(Ident("a"), Punct('-'), Ident("b"), EOF))
    assert(lex("a-b") == Vector(Ident("a-b"), EOF)) // '-' is an identifier char (ll:109)
  }

  test("URI-decoding of leaf keywords (C1, util.h:159-193)") {
    import graft.functions.Funcs
    assert(Funcs.decodeUriComponent("status%3AF") == "status:F")
    assert(Funcs.decodeUriComponent("a%20b") == "a b")
    assert(Funcs.decodeUriComponent("plain") == "plain")
  }

  test("the COLUMN renderings of C5/C10 agree with the driver-side " +
      "functions the executors actually use (review finding, r19: the " +
      "column pair was untested and free to drift)") {
    import graft.functions.Funcs
    import TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val ks = Seq(0L, 1L, 25L, 26L, 27L, 675L, 676L, 11881375L)
    val gotB = ks.toDF("k")
      .select(Funcs.base26Key(col("k"))).as[String].collect()
    assert(gotB.toSeq == ks.map(graft.exec.QueryExec.base26))
    val ds = Seq(0.0, 1.0, 9204.0, 19000.0)
    val gotD = ds.toDF("d")
      .select(Funcs.daysToDateString(col("d"))).as[String].collect()
    assert(gotD.toSeq == ds.map(graft.exec.QueryExec.daysToDate))
  }
}
