package graft.parser

import graft.ast._

/** PARSE-statement printer, transcribing PrintQuery
  * (/root/reference/src/query.cc:630-724): binary nodes print fully
  * parenthesized, scalars print with C's `%.9g`.
  *
  * Deviation: the reference omits the closing parenthesis after MAX(/MIN(
  * (query.cc:642-650 — `printf("MAX(")` with no matching `)`), which makes
  * its own output unparseable; we close the parenthesis so that
  * parse(print(q)) == q holds (pinned by the round-trip tests in ParserSpec).
  */
object Printer {

  /** C `%.9g` (approximately): up to 9 significant digits, trailing zeros
    * stripped, scientific notation outside [1e-5, 1e9). */
  def g9(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinity) return if (d > 0) "inf" else "-inf"
    if (d == 0.0) return "0"
    val abs = math.abs(d)
    val bd = new java.math.BigDecimal(d).round(new java.math.MathContext(9)).stripTrailingZeros
    if (abs >= 1e-5 && abs < 1e9) bd.toPlainString
    else {
      // C-style exponent form: d.ddddddddde±xx
      val unscaled = bd.unscaledValue.toString
      val digits = if (unscaled.startsWith("-")) unscaled.substring(1) else unscaled
      val sign = if (d < 0) "-" else ""
      val exp = digits.length - 1 - bd.scale
      val mant =
        if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val expSign = if (exp < 0) "-" else "+"
      f"$sign$mant%se$expSign${math.abs(exp)}%02d"
    }
  }

  def print(q: Query): String = q match {
    case DocKey(id) => s"KEY=$id"
    case Leaf(id) => id
    case Un(UnKind.Max, lhs) => s"MAX(${print(lhs)})"
    case Un(UnKind.Min, lhs) => s"MIN(${print(lhs)})"
    case Un(UnKind.Negate, lhs) => s"~(${print(lhs)})"
    case Sample(lhs, n) => s"RANDOM_SAMPLE(${print(lhs)}, ${g9(n.toDouble)})"
    case Bin(BinKind.Or, l, r) => s"(${print(l)} + ${print(r)})"
    case Bin(BinKind.And, l, r) => s"(${print(l)} AND ${print(r)})"
    case Bin(BinKind.Subtract, l, r) => s"(${print(l)} - ${print(r)})"
    case Bin(BinKind.OrderBy, l, r) => s"(${print(l)} ORDER BY ${print(r)})"
    case CmpScalar(op, l, v) => s"(${print(l)}${op.sym}${g9(v)})"
    case CmpQuery(op, l, r) => s"(${print(l)}${op.sym}${print(r)})"
    case InRange(l, lo, hi) => s"(${print(l)}[${g9(lo)},${g9(hi)}])"
  }

  def printStatement(s: Statement): String = s match {
    case ParseStmt(q) => s"PARSE ${print(q)}"
    case QueryStmt(keysOnly, q, th, lim, off) =>
      val sb = new StringBuilder("QUERY ")
      if (keysOnly) sb.append("KEYS FOR ")
      sb.append(print(q))
      th.foreach { t =>
        sb.append(" THRESHOLDS ").append(t.values.map(g9).mkString(","))
          .append(" FOR KEY '").append(t.key).append("'")
      }
      if (lim >= 0) sb.append(s" LIMIT $lim")
      if (off > 0) sb.append(s" OFFSET $off")
      sb.toString
    case CorrelateStmt(a, b) => s"CORRELATE QUERY ${print(a)}, ${print(b)}"
    case SelectStmt(fields, from, withSumm, par) =>
      val sb = new StringBuilder("SELECT ")
      if (par > 0) sb.append(s"PARALLEL $par ")
      sb.append(fields.map(print).mkString(", "))
      sb.append(" FROM ").append(print(from))
      if (withSumm) sb.append(" WITH SUMMARIES")
      sb.toString
    case SetOutputFormat(OutputFormat.Csv) => "SET OUTPUT FORMAT CSV"
    case SetOutputFormat(OutputFormat.Json) => "SET OUTPUT FORMAT JSON"
    case SetTimeFormat(f) => s"SET TIME FORMAT '$f'"
  }
}
