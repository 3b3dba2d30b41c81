package graft.hll

import graft.theta.{ThetaEstimate, ThetaUnionAgg, ThetaUnionCountAgg}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Catalyst optimizer rule: fuse `estimate(merge(x) OVER w)` sketch pairs
 * into a single estimating window aggregate, across sketch families:
 *
 *  - `hll_cardinality(hll_merge(x) OVER w)`   → [[HllMergeCardinality]]
 *  - `theta_estimate(theta_union(x) OVER w)`  → [[graft.theta.ThetaUnionCountAgg]]
 *
 * A running (expanding-frame) window evaluates its aggregate once per ROW,
 * and a merge aggregate's eval serializes the whole sketch buffer — which
 * the estimating scalar immediately re-parses (for theta, eval also SORTS
 * the retained-hash array into compact-ordered form first). When the
 * bytes are consumed ONLY by the estimator, both hops are dead work: the
 * fused aggregate estimates straight off the live buffer, turning per-row
 * cost from O(serialize + parse + estimate) into O(estimate). Union
 * state, null semantics (empty group → null) and the estimate itself are
 * bit-identical — only the representation crossing the operator boundary
 * changes (long instead of bytes). The same seam extends to further
 * families (a KLL quantile variant needs the quantile literal folded into
 * the fused aggregate).
 *
 * The rewrite fires only when the plan PROVES the bytes are unobserved:
 * the window output attribute must be referenced exclusively as the child
 * of the family's estimator (carrying the same wire format, for HLL). Any
 * other use (storing the sketch, merging it again, a different format
 * argument) keeps the original pair. Disable with
 * `spark.graft.fuse.windowSketchEval=false`.
 *
 * Injected by [[GraftSparkExtensions]] (`injectOptimizerRule`) — runs
 * after analysis, so the pattern is the analyzer's canonical
 * Project-over-Window shape with extracted window expressions.
 */
object FuseWindowSketchEval extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.fuse.windowSketchEval", "true").toBoolean) return plan
    plan.transformUp {
      case p @ Project(projectList, w: Window) =>
        val fusible: Map[ExprId, AggregateFunction] = w.windowExpressions.collect {
          case a @ Alias(WindowExpression(
              AggregateExpression(m: HllMerge, _, false, None, _), _), _)
              if allConsumersMatch(projectList, a.exprId) {
                case HllCardinality(ar: AttributeReference, f) =>
                  ar.exprId == a.exprId && f == m.format
              } =>
            a.exprId -> HllMergeCardinality(m.child, m.format,
              m.mutableAggBufferOffset, m.inputAggBufferOffset)
          case a @ Alias(WindowExpression(
              AggregateExpression(t: ThetaUnionAgg, _, false, None, _), _), _)
              if allConsumersMatch(projectList, a.exprId) {
                case ThetaEstimate(ar: AttributeReference) => ar.exprId == a.exprId
              } =>
            a.exprId -> ThetaUnionCountAgg(t.child, t.lgK,
              t.mutableAggBufferOffset, t.inputAggBufferOffset)
        }.toMap
        if (fusible.isEmpty) p
        else {
          val newWindowExprs = w.windowExpressions.map {
            case a @ Alias(we @ WindowExpression(ae: AggregateExpression, _), name)
                if fusible.contains(a.exprId) =>
              val fusedAgg = ae.copy(aggregateFunction = fusible(a.exprId))
              Alias(we.copy(windowFunction = fusedAgg), name)(a.exprId, a.qualifier,
                a.explicitMetadata, a.nonInheritableMetadataKeys)
            case other => other
          }
          val newWindow = w.copy(windowExpressions = newWindowExprs)
          val attrByExprId = newWindow.windowOutputSet.map(att => att.exprId -> att).toMap
          val newProjectList = projectList.map(_.transform {
            case HllCardinality(ar: AttributeReference, _) if fusible.contains(ar.exprId) =>
              attrByExprId(ar.exprId)
            case ThetaEstimate(ar: AttributeReference) if fusible.contains(ar.exprId) =>
              attrByExprId(ar.exprId)
          }.asInstanceOf[NamedExpression])
          Project(newProjectList, newWindow)
        }
    }
  }

  /** True iff every reference to `id` in `exprs` sits inside an expression
   * accepted by `consumer` — i.e. the plan proves nothing ever looks at
   * the sketch BYTES outside the family's estimator. */
  private def allConsumersMatch(exprs: Seq[Expression], id: ExprId)(
      consumer: PartialFunction[Expression, Boolean]): Boolean = {
    var total = 0
    var matched = 0
    exprs.foreach(_.foreach {
      case ar: AttributeReference if ar.exprId == id => total += 1
      case _ =>
    })
    exprs.foreach(_.foreach { e =>
      if (consumer.isDefinedAt(e) && consumer(e)) matched += 1
    })
    total > 0 && total == matched
  }
}
