package graft.ast

/** The cantera statement/query AST, mirroring the reference's arena structs
  * (/root/reference/src/query.h:24-144) as immutable case classes.
  *
  * Query node kinds map 1:1 to the reference's enum
  * (query.h:32-37 kQueryKey/kQueryLeaf/kQueryBinaryOperator/kQueryUnaryOperator)
  * but are split by arity/payload so illegal shapes are unrepresentable:
  * the reference overloads GT/LT between "score vs scalar" (F2/F3) and
  * "score vs other query's score at same offset" (J4) via a nullable rhs
  * pointer; here those are distinct nodes (CmpScalar vs CmpQuery).
  */
sealed trait Query

/** kQueryLeaf — keyword lookup in the index (query.h:34). The identifier is
  * URI-decoded before lookup (query.cc:203) and may use the magic forms
  * `in-FIELD:PARAM` (prefix+contains scan, query.cc:306-352) and
  * `FIELD-in:KEY` (CAS blob expansion, query.cc:228-305). */
final case class Leaf(identifier: String) extends Query

/** kQueryKey — `KEY=doc` direct summary lookup, bypassing the index
  * (query.h:33, query.cc:397-406). */
final case class DocKey(identifier: String) extends Query

sealed trait BinKind
object BinKind {
  case object Or extends BinKind        // kOperatorOr
  case object And extends BinKind       // kOperatorAnd
  case object Subtract extends BinKind  // kOperatorSubtract
  case object OrderBy extends BinKind   // kOperatorOrderBy
}

/** OR / AND / - / ORDER BY between two posting sets (query.h:40-42,50). */
final case class Bin(kind: BinKind, lhs: Query, rhs: Query) extends Query

sealed trait CmpOp { def sym: String }
object CmpOp {
  case object Eq extends CmpOp { val sym = "=" }   // kOperatorEQ
  case object Gt extends CmpOp { val sym = ">" }   // kOperatorGT
  case object Ge extends CmpOp { val sym = ">=" }  // kOperatorGE
  case object Lt extends CmpOp { val sym = "<" }   // kOperatorLT
  case object Le extends CmpOp { val sym = "<=" }  // kOperatorLE
}

/** `q OP n` — score filter against a scalar (F1-F3, query.cc:451-505). */
final case class CmpScalar(op: CmpOp, lhs: Query, value: Double) extends Query

/** `a > b` / `a < b` — theta-compare join against another query's scores at
  * the same offset (J4, query.cc:171-196). Grammar only admits strict > and <
  * with a query rhs (query-parser.yy:322-341). */
final case class CmpQuery(op: CmpOp, lhs: Query, rhs: Query) extends Query

/** `q [lo, hi]` — inclusive score range, bounds auto-swapped when reversed
  * (F4, query.cc:507-517). */
final case class InRange(lhs: Query, lo: Double, hi: Double) extends Query

/** RANDOM_SAMPLE(q, n) — deterministic n-posting sample (T3,
  * query.cc:549-568). */
final case class Sample(lhs: Query, n: Long) extends Query

sealed trait UnKind
object UnKind {
  case object Max extends UnKind     // kOperatorMax — per-offset max (A1)
  case object Min extends UnKind     // kOperatorMin — per-offset min (A2)
  case object Negate extends UnKind  // kOperatorNegate — score := -score (A3)
}

final case class Un(kind: UnKind, lhs: Query) extends Query

// ---------------------------------------------------------------------------
// Statements (query.h:88-144)
// ---------------------------------------------------------------------------

sealed trait Statement

/** THRESHOLDS v1,v2,... FOR KEY 'k' — bucket clause on a QUERY
  * (query.h:83-86; grammar query-parser.yy:454-464). A leading '~' on the key
  * reverses bucket labels (query.cc:756-760). */
final case class Thresholds(key: String, values: List[Double])

/** QUERY [KEYS FOR] q [THRESHOLDS ...] [LIMIT n|FETCH ...] [OFFSET n]
  * (query.h:88-98). limit = -1 means all (query-parser.yy:528). */
final case class QueryStmt(
    keysOnly: Boolean,
    query: Query,
    thresholds: Option[Thresholds] = None,
    limit: Long = -1L,
    offset: Long = 0L) extends Statement

/** CORRELATE QUERY a, b (query.h:100-103). */
final case class CorrelateStmt(queryA: Query, queryB: Query) extends Statement

/** PARSE q — round-trip printer / explain (query.h:113-115). */
final case class ParseStmt(query: Query) extends Statement

/** SELECT [PARALLEL n] f1, f2 FROM q [WITH SUMMARIES] (query.h:117-122). */
final case class SelectStmt(
    fields: List[Query],
    from: Query,
    withSummaries: Boolean = false,
    parallel: Long = 0L) extends Statement

/** SET OUTPUT FORMAT CSV|JSON / SET TIME FORMAT 'fmt' (query.h:105-111,124-130). */
sealed trait SetStmt extends Statement
final case class SetOutputFormat(format: OutputFormat) extends SetStmt
final case class SetTimeFormat(format: String) extends SetStmt

sealed trait OutputFormat
object OutputFormat {
  case object Csv extends OutputFormat
  case object Json extends OutputFormat
}
