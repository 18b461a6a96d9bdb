package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** The tier-(c) extension surface (custom `LogicalPlan` + injected rule):
  * an AS-OF JOIN as a first-class logical operator. The node carries the
  * operator's SEMANTICS (key, event-time column, payload columns); the
  * injected resolution rule lowers it during analysis into the proven
  * union + ignoreNulls-last-window composition (`operators/AsOfJoin`),
  * aliased back onto the node's declared attribute ids so downstream
  * resolution never notices the rewrite.
  *
  * Why a rule and not a custom `SparkPlan`: the composition already
  * yields the optimal physical shape (ONE hash exchange on the key + a
  * per-partition sort — exactly what a dedicated operator would do), so
  * the node's value is the STABLE SEMANTIC BOUNDARY: callers state the
  * as-of intent, the engine owns the lowering, and a future smarter
  * physical strategy (e.g. range-partitioned merge without the union)
  * can replace the lowering without touching any call site.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    key: String, ts: String, quoteCols: Seq[String],
    outputAttrs: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = outputAttrs

  // never "resolved": analysis MUST lower it (a missed rule registration
  // fails loudly at analysis instead of reaching the planner)
  override lazy val resolved: Boolean = false

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {

  /** Build a DataFrame whose logical plan is the as-of node; analysis
    * (the injected rule) lowers it. Quote columns surface nullable —
    * facts with no prior quote keep NULLs (left semantics).
    */
  def build(facts: DataFrame, quotes: DataFrame, key: String, ts: String,
      quoteCols: Seq[String]): DataFrame = {
    val sc = facts.sparkSession
    val l = facts.queryExecution.analyzed
    val r = quotes.queryExecution.analyzed
    val qa = quoteCols.map { c =>
      val a = r.output.find(_.name == c).getOrElse(throw
        new IllegalArgumentException(s"quote column $c not in ${r.output}"))
      AttributeReference(c, a.dataType, nullable = true)()
    }
    org.apache.spark.sql.GraftPlanBridge.ofRows(sc,
      AsOfJoinPlan(l, r, key, ts, quoteCols, l.output ++ qa))
  }
}

/** Injected via GraftExtensions.injectResolutionRule: lowers every
  * [[AsOfJoinPlan]] into the composed operator, preserving the node's
  * attribute ids through an aliasing Project.
  */
class ResolveAsOfJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p: AsOfJoinPlan if p.left.resolved && p.right.resolved =>
      val lowered = graft.operators.AsOfJoin.asOf(
        org.apache.spark.sql.GraftPlanBridge.ofRows(spark, p.left),
        org.apache.spark.sql.GraftPlanBridge.ofRows(spark, p.right),
        p.key, p.ts, p.quoteCols).queryExecution.analyzed
      Project(p.outputAttrs.zip(lowered.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId)
      }, lowered)
  }
}
