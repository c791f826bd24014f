package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.DotProduct

/** Session extensions registering graft's native Catalyst functions and
  * optimizer rules (installed via spark.sql.extensions in
  * GraftSession.builder — the idiomatic injection point, so any session
  * built from our builder, incl. spark-submit'ed cluster jobs, gets them). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    // anchored-regex filters gain a pushable StartsWith conjunct (the
    // reference's RE2::PossibleMatchRange seek, Spark-shaped)
    e.injectOptimizerRule(_ => graft.plans.RegexPrefixPushdown)
  }
}
