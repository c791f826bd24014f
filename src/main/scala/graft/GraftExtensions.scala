package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{DotProduct, PqSim, Sq8Sim}

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
    e.injectFunction((
      FunctionIdentifier("graft_sq8_sim"),
      new ExpressionInfo(classOf[Sq8Sim].getName, "graft_sq8_sim"),
      (children: Seq[Expression]) => Sq8Sim(children(0), children(1),
        children(2), children(3), children(4))))
    e.injectFunction((
      FunctionIdentifier("graft_pq_sim"),
      new ExpressionInfo(classOf[PqSim].getName, "graft_pq_sim"),
      (children: Seq[Expression]) => PqSim(children(0), children(1),
        children(2))))
    // anchored-regex filters gain a pushable StartsWith conjunct (the
    // reference's RE2::PossibleMatchRange seek, Spark-shaped)
    e.injectOptimizerRule(_ => graft.plans.RegexPrefixPushdown)
  }
}
