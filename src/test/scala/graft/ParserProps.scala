package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ast._
import graft.parser.{Parser, Printer}

/** Round-trip law: parse(print(x)) == x for generated ASTs — pins the printer
  * and parser to each other across the whole grammar (the reference's PARSE
  * statement is its own round-trip printer, query.cc:630-724).
  */
object ParserProps extends Properties("Parser") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.oneOf(Gen.alphaLowerChar, Gen.numChar))
  } yield (h :: t).mkString

  private val number: Gen[Double] =
    Gen.oneOf(Gen.choose(-999, 999).map(_.toDouble),
      Gen.choose(-9999, 9999).map(_ / 4.0))

  private def genQuery(depth: Int): Gen[Query] = {
    val leaf: Gen[Query] = Gen.oneOf(
      ident.map(Leaf), ident.map(DocKey))
    if (depth <= 0) leaf
    else {
      val sub = genQuery(depth - 1)
      Gen.frequency(
        3 -> leaf,
        2 -> (for {
          k <- Gen.oneOf(BinKind.Or, BinKind.And, BinKind.Subtract, BinKind.OrderBy)
          l <- sub; r <- sub
        } yield Bin(k, l, r)),
        1 -> (for {
          op <- Gen.oneOf(CmpOp.Eq, CmpOp.Gt, CmpOp.Ge, CmpOp.Lt, CmpOp.Le)
          l <- sub; v <- number
        } yield CmpScalar(op, l, v)),
        1 -> (for {
          op <- Gen.oneOf(CmpOp.Gt, CmpOp.Lt)
          l <- sub; r <- sub
        } yield CmpQuery(op, l, r)),
        1 -> (for { l <- sub; lo <- number; hi <- number } yield InRange(l, lo, hi)),
        1 -> (for { l <- sub; n <- Gen.choose(1L, 999L) } yield Sample(l, n)),
        1 -> (for {
          k <- Gen.oneOf(UnKind.Max, UnKind.Min, UnKind.Negate); l <- sub
        } yield Un(k, l)))
    }
  }

  private val genStatement: Gen[Statement] = Gen.oneOf(
    genQuery(2).map(ParseStmt),
    for {
      q <- genQuery(2)
      keysOnly <- Gen.oneOf(true, false)
      th <- Gen.option(for {
        k <- ident
        vs <- Gen.nonEmptyListOf(number).map(_.take(4))
      } yield Thresholds(k, vs))
      lim <- Gen.oneOf(Gen.const(-1L), Gen.choose(0L, 500L))
      off <- Gen.choose(0L, 100L)
    } yield QueryStmt(keysOnly, q, th, lim, off),
    for { a <- genQuery(2); b <- genQuery(2) } yield CorrelateStmt(a, b),
    for {
      fs <- Gen.nonEmptyListOf(genQuery(1)).map(_.take(3))
      from <- genQuery(2)
      ws <- Gen.oneOf(true, false)
    } yield SelectStmt(fs, from, ws),
    Gen.oneOf(SetOutputFormat(OutputFormat.Csv), SetOutputFormat(OutputFormat.Json)),
    ident.map(SetTimeFormat))

  property("parse(print(query)) == query") = forAll(genQuery(3)) { q =>
    Parser.parseQuery(Printer.print(q)) == q
  }

  property("parse(print(statement)) == statement") = forAll(genStatement) { s =>
    Parser.parseStatement(Printer.printStatement(s) + ";") == s
  }
}
