package graft.hll

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Catalyst optimizer rule: fuse `hll_cardinality(hll_merge(x) OVER w)`
 * into a single [[HllMergeCardinality]] window aggregate.
 *
 * A running (expanding-frame) window evaluates its aggregate once per ROW,
 * and [[HllMerge]]'s eval serializes the whole sketch buffer — which
 * `hll_cardinality` immediately re-parses. When the sketch bytes are
 * consumed ONLY by `hll_cardinality`, both hops are dead work: the fused
 * aggregate estimates straight off the live buffer, turning
 * per-row cost from O(serialize + parse + estimate) into O(estimate).
 * Union state, null semantics (empty group → null) and the estimate
 * itself are bit-identical — only the representation crossing the
 * operator boundary changes (long instead of bytes).
 *
 * The rewrite fires only when the plan PROVES the bytes are unobserved:
 * the window output attribute must be referenced exclusively as the child
 * of `hll_cardinality` calls carrying the same wire format. Any other use
 * (storing the sketch, merging it again, a different format argument)
 * keeps the original pair. Disable with
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
        val fusible = w.windowExpressions.collect {
          case a @ Alias(WindowExpression(
              ae @ AggregateExpression(m: HllMerge, _, false, None, _), _), _)
              if onlyCardinalityConsumers(projectList, a.exprId, m.format) =>
            a.exprId -> ((a, ae, m))
        }.toMap
        if (fusible.isEmpty) p
        else {
          val newWindowExprs = w.windowExpressions.map {
            case a @ Alias(we @ WindowExpression(ae @ AggregateExpression(_, _, _, _, _), _), name)
                if fusible.contains(a.exprId) =>
              val m = fusible(a.exprId)._3
              val fusedAgg = ae.copy(aggregateFunction =
                HllMergeCardinality(m.child, m.format, m.mutableAggBufferOffset,
                  m.inputAggBufferOffset))
              Alias(we.copy(windowFunction = fusedAgg), name)(a.exprId, a.qualifier,
                a.explicitMetadata, a.nonInheritableMetadataKeys)
            case other => other
          }
          val newWindow = w.copy(windowExpressions = newWindowExprs.asInstanceOf[Seq[NamedExpression]])
          val attrByExprId = newWindow.windowOutputSet.map(att => att.exprId -> att).toMap
          val newProjectList = projectList.map(_.transform {
            case HllCardinality(ar: AttributeReference, _) if fusible.contains(ar.exprId) =>
              attrByExprId(ar.exprId)
          }.asInstanceOf[NamedExpression])
          Project(newProjectList, newWindow)
        }
    }
  }

  /** True iff every reference to `id` in `exprs` is exactly
   * `hll_cardinality(attr)` with the matching wire format — i.e. the plan
   * proves nothing ever looks at the sketch BYTES. */
  private def onlyCardinalityConsumers(exprs: Seq[Expression], id: ExprId,
      fmt: HllFormat): Boolean = {
    var total = 0
    var fused = 0
    exprs.foreach(_.foreach {
      case ar: AttributeReference if ar.exprId == id => total += 1
      case _ =>
    })
    exprs.foreach(_.foreach {
      case HllCardinality(ar: AttributeReference, f) if ar.exprId == id && f == fmt =>
        fused += 1
      case _ =>
    })
    total > 0 && total == fused
  }
}
