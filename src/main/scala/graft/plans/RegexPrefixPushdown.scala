package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, Literal, RLike, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst analogue of the reference's regex seek range
  * (RE2::PossibleMatchRange, /root/reference/src/ca-dump.cc:334-338): every
  * string matching an anchored regex must start with the regex's literal
  * head, so `key rlike '^priority:[12].*'` implies
  * `key startsWith 'priority:'`. Catalyst cannot derive that itself — an
  * RLike never reaches the data source, so the scan reads every row group.
  * This rule adds the implied StartsWith as an extra conjunct; the built-in
  * pushdown then translates it to a StringStartsWith source filter
  * (parquet min/max + dictionary pruning on the key-sorted files), and the
  * rlike evaluates only on the pruned remainder. The original predicate is
  * always kept, so the rewrite is semantics-preserving by construction —
  * the derivation only needs to be CONSERVATIVE (never claim a prefix a
  * matching string could lack).
  *
  * Session-wide via GraftExtensions: Dump's regex dumps, SortedWriter.copy's
  * key filters, and any ad-hoc `rlike` filter all inherit it.
  */
object RegexPrefixPushdown extends Rule[LogicalPlan] {

  /** Longest prefix every rlike match is guaranteed to start with.
    * None when the regex is unanchored, starts with a metachar, or contains
    * a top-level risk we don't analyze (alternation anywhere → the '^' may
    * not govern the whole pattern). A literal char immediately followed by a
    * quantifier is excluded ("^ab*c" matches "ac", so only "a" is safe). */
  def literalPrefix(re: String): Option[String] = {
    // normalize the FullMatch rendering Keywords.toPredicate emits —
    // \A(?:X)\z — to the ^-anchored shape this derivation understands
    // (review finding, r19: the doc promised keyword regex filters the
    // derived-prefix pushdown, but only '^' anchors were recognized).
    // Accepted ONLY in the exact single-group form with no other parens,
    // so the group spans the whole pattern and cannot be quantified.
    val norm =
      if (re.startsWith("\\A(?:") && re.endsWith(")\\z") &&
          !re.substring(5, re.length - 3).exists(c => c == '(' || c == ')'))
        "^" + re.substring(5, re.length - 3)
      else re
    if (!norm.startsWith("^")) return None
    val body = norm.drop(1)
    if (body.contains('|')) return None
    val meta = ".[]{}()*+?\\$^" // '^' too: "^^abc" matches "abc", not "^abc"
    val lit = body.takeWhile(c => !meta.contains(c))
    val safe =
      if (lit.length < body.length && "*+?{".contains(body(lit.length)))
        lit.dropRight(1)
      else lit
    if (safe.isEmpty) None else Some(safe)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val cs = conjuncts(cond)
      val derived = cs.flatMap {
        case RLike(attr, Literal(re: UTF8String, StringType))
            if attr.deterministic =>
          literalPrefix(re.toString).map(p =>
            StartsWith(attr, Literal(UTF8String.fromString(p), StringType)))
        case _ => None
      }.filterNot(d => cs.exists(_.semanticEquals(d))) // idempotent
      if (derived.isEmpty) f
      else Filter(derived.foldLeft(cond)(And(_, _)), child)
  }
}
