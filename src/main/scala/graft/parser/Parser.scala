package graft.parser

import graft.ast._
import graft.parser.Lexer._

/** Recursive-descent parser for the cantera statement language, implementing
  * the bison grammar at /root/reference/src/query-parser.yy:98-535.
  *
  * Operator precedence: the reference declares a single `%left` level for
  * `+ OR - AND_NOT AND` (yy:95), and juxtaposition of sub-queries is AND
  * (yy:415-427); ORDER BY parses with a full sub-query list as lhs
  * (yy:353-362). We therefore parse all connectives at one left-associative
  * level, with comparison/range/sample/negate postfixes binding tighter
  * (the `subQuery` production).
  *
  * Leniencies (documented supersets of the reference grammar):
  *  - single-quoted strings are accepted as leaf keywords (the reference only
  *    admits bare or double-quoted identifiers as leaves, yy:219-226);
  *  - the outer parentheses that `query` requires (yy:213-215) are optional;
  *  - MAX/MIN/RANDOM_SAMPLE bodies may be full sub-query lists.
  */
object Parser {

  final case class ParseError(message: String, pos: Int)
      extends RuntimeException(s"parse error at token $pos: $message")

  /** Leading UTF-8 BOM tolerated (query-parser.yy:116-118 `bom: UTF8BOM |`). */
  def parseStatements(input: String): List[Statement] =
    new P(lex(input.stripPrefix("\uFEFF"))).script()

  def parseStatement(input: String): Statement =
    parseStatements(input) match {
      case List(s) => s
      case ss => throw ParseError(s"expected exactly one statement, got ${ss.length}", 0)
    }

  /** Parse a bare query expression (no statement keyword). */
  def parseQuery(input: String): Query = {
    val p = new P(lex(input))
    val q = p.exprList()
    p.expectEOF()
    q
  }

  private final class P(toks: Vector[Tok]) {
    private var pos = 0

    private def cur: Tok = toks(pos)
    private def advance(): Tok = { val t = cur; pos += 1; t }
    private def fail(msg: String): Nothing = throw ParseError(s"$msg (got $cur)", pos)

    private def at(kw: String): Boolean = cur == Kw(kw)
    private def eat(kw: String): Boolean = if (at(kw)) { pos += 1; true } else false
    private def expectKw(kw: String): Unit = if (!eat(kw)) fail(s"expected $kw")
    private def atP(c: Char): Boolean = cur == Punct(c)
    private def eatP(c: Char): Boolean = if (atP(c)) { pos += 1; true } else false
    private def expectP(c: Char): Unit = if (!eatP(c)) fail(s"expected '$c'")

    def expectEOF(): Unit = if (cur != EOF) fail("expected end of input")

    def script(): List[Statement] = {
      val stmts = List.newBuilder[Statement]
      while (cur != EOF) {
        stmts += statement()
        if (!eatP(';') && cur != EOF) fail("expected ';'")
      }
      stmts.result()
    }

    // ----- statements (yy:119-199) -----

    def statement(): Statement =
      if (eat("QUERY")) {
        val keysOnly = eat("KEYS") && { expectKw("FOR"); true }
        val q = queryProd()
        val th = thresholdClause()
        val lim = fetchClause()
        val off = offsetClause()
        QueryStmt(keysOnly, q, th, lim, off)
      } else if (eat("CORRELATE")) {
        expectKw("QUERY")
        val a = queryProd()
        expectP(',')
        val b = queryProd()
        CorrelateStmt(a, b)
      } else if (eat("PARSE")) {
        ParseStmt(exprList())
      } else if (eat("SELECT")) {
        val par = if (eat("PARALLEL")) integer() else 0L
        val fields = List.newBuilder[Query]
        fields += exprList()
        while (eatP(',')) fields += exprList()
        expectKw("FROM")
        val from = queryProd()
        val withSumm = eat("WITH") && { expectKw("SUMMARIES"); true }
        SelectStmt(fields.result(), from, withSumm, par)
      } else if (eat("SET")) {
        if (eat("OUTPUT")) {
          expectKw("FORMAT")
          if (eat("CSV")) SetOutputFormat(OutputFormat.Csv)
          else if (eat("JSON")) SetOutputFormat(OutputFormat.Json)
          else fail("expected CSV or JSON")
        } else if (eat("TIME")) {
          expectKw("FORMAT")
          cur match {
            case StrLit(s) => advance(); SetTimeFormat(s)
            case _ => fail("expected string literal time format")
          }
        } else fail("expected OUTPUT or TIME")
      } else fail("expected QUERY, CORRELATE, PARSE, SELECT or SET")

    /** `query : '(' subQueryList ')'` (yy:213-215); parens made optional. */
    private def queryProd(): Query = exprList()

    private def thresholdClause(): Option[Thresholds] =
      if (eat("THRESHOLDS")) {
        val vs = List.newBuilder[Double]
        vs += number()
        while (eatP(',')) vs += number()
        expectKw("FOR"); expectKw("KEY")
        val key = cur match {
          case StrLit(s) => advance(); s
          case Ident(s) => advance(); s
          case _ => fail("expected threshold key")
        }
        Some(Thresholds(key, vs.result()))
      } else None

    private def fetchClause(): Long =
      if (eat("LIMIT")) integer()
      else if (eat("FETCH")) {
        if (!eat("FIRST") && !eat("NEXT")) fail("expected FIRST or NEXT")
        val v = integer()
        eat("ROW"); eat("ROWS")
        expectKw("ONLY")
        v
      } else -1L

    private def offsetClause(): Long =
      if (eat("OFFSET")) { val v = integer(); eat("ROW"); eat("ROWS"); v } else 0L

    private def integer(): Long = cur match {
      case IntLit(v) => advance(); v
      case _ => fail("expected integer")
    }

    private def number(): Double = cur match {
      case IntLit(v) => advance(); v.toDouble
      case NumLit(v, _) => advance(); v
      case DateLit(raw) => advance(); dateToDays(raw)
      case _ => fail("expected number")
    }

    private def atNumber: Boolean = cur match {
      case IntLit(_) | NumLit(_, _) | DateLit(_) => true
      case _ => false
    }

    // ----- query expressions -----

    /** subQueryList: left-assoc chain of OR/+/-/AND_NOT/AND/ORDER BY and
      * juxtaposition (= AND), all one precedence level (yy:95,353-427). */
    def exprList(): Query = {
      var acc = subQuery()
      var done = false
      while (!done) {
        if (eat("OR") || eatP('+')) acc = Bin(BinKind.Or, acc, subQuery())
        else if (eatP('-') || eat("AND_NOT")) acc = Bin(BinKind.Subtract, acc, subQuery())
        else if (eat("AND")) acc = Bin(BinKind.And, acc, subQuery())
        else if (eat("ORDER_BY")) acc = Bin(BinKind.OrderBy, acc, subQuery())
        else if (atOperandStart) acc = Bin(BinKind.And, acc, subQuery()) // juxtaposition
        else done = true
      }
      acc
    }

    private def atOperandStart: Boolean = cur match {
      case Ident(_) | StrLit(_) => true
      case Punct('(') | Punct('~') => true
      case Kw("KEY") | Kw("MAX") | Kw("MIN") | Kw("RANDOM_SAMPLE") => true
      case _ => false
    }

    /** subQuery: an operand with left-assoc comparison/range postfixes
      * (yy:217-413). */
    private def subQuery(): Query = {
      var q = operand()
      var done = false
      while (!done) {
        if (eatP('=')) q = CmpScalar(CmpOp.Eq, q, number())
        else if (eatP('>')) {
          if (eatP('=')) q = CmpScalar(CmpOp.Ge, q, number())
          else if (atNumber) q = CmpScalar(CmpOp.Gt, q, number())
          else q = CmpQuery(CmpOp.Gt, q, operand())
        } else if (eatP('<')) {
          if (eatP('=')) q = CmpScalar(CmpOp.Le, q, number())
          else if (atNumber) q = CmpScalar(CmpOp.Lt, q, number())
          else q = CmpQuery(CmpOp.Lt, q, operand())
        } else if (eatP('[')) {
          val lo = number(); expectP(','); val hi = number(); expectP(']')
          q = InRange(q, lo, hi)
        } else done = true
      }
      q
    }

    private def operand(): Query =
      if (eatP('(')) { val q = exprList(); expectP(')'); q }
      else if (eatP('~')) Un(UnKind.Negate, operand())
      else if (eat("MAX")) { expectP('('); val q = exprList(); expectP(')'); Un(UnKind.Max, q) }
      else if (eat("MIN")) { expectP('('); val q = exprList(); expectP(')'); Un(UnKind.Min, q) }
      else if (eat("RANDOM_SAMPLE")) {
        expectP('('); val q = exprList(); expectP(','); val v = integer(); expectP(')')
        Sample(q, v)
      } else if (eat("KEY")) {
        expectP('=')
        cur match {
          case Ident(s) => advance(); DocKey(s)
          case StrLit(s) => advance(); DocKey(s)
          case _ => fail("expected document key")
        }
      } else cur match {
        case Ident(s) => advance(); Leaf(s)
        case StrLit(s) => advance(); Leaf(s) // leniency: quoted leaf keywords
        case _ => fail("expected sub-query")
      }
  }
}
