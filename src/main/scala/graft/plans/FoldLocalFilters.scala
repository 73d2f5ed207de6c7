package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Predicate, SubqueryExpression, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Fold a deterministic Filter over a [[LocalRelation]] into the relation
  * by evaluating the predicate driver-side — the missing sibling of
  * Spark's own `ConvertToLocalRelation`, which folds Project and Limit
  * but leaves Filter as a physical operator.
  *
  * Why it matters: [[graft.Catalog]] inlines bounded-cardinality
  * reference tables (nation/region — kilobytes at ANY scale factor) as
  * LocalRelations so their broadcast builds need no scheduled job. But a
  * join immediately wraps the build side in Filter(IsNotNull(key)) (and
  * user predicates like `r_name = 'EUROPE'` sit there too), and a
  * physical Filter(LocalTableScan) turns the broadcast build back into a
  * real job over `leafNodeDefaultParallelism` tasks — the r9 SF1 floor
  * profile priced each such job at ~15-25 ms of pure scheduling on a
  * sub-millisecond filter. Folding driver-side makes the build side a
  * bare LocalRelation again, whose `executeCollect` is job-free.
  *
  * Safety: deterministic, subquery-free predicates only, and the
  * condition must be fully BOUND by the relation's own output with no
  * Unevaluable node — the optimizer re-executes user rules inside
  * subquery plans, where a correlated predicate over an inlined tiny dim
  * carries an OuterReference (deterministic, not a SubqueryExpression);
  * handing that to `Predicate.create` fails attribute binding and turns
  * a valid query into a plan-time crash (round-10 advice, medium).
  * Evaluation is the same codegen-less `Predicate` interpreter an
  * executor would run, so ANSI failures surface identically (just
  * earlier). Relations this rule sees are catalog-inlined tiny dims —
  * tens of rows — so the driver-side eval is strictly cheaper than
  * scheduling the task that would have done it. */
object FoldLocalFilters extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond, lr: LocalRelation)
        if cond.deterministic && !SubqueryExpression.hasSubquery(cond) &&
          cond.references.subsetOf(lr.outputSet) &&
          !cond.exists(_.isInstanceOf[Unevaluable]) =>
      val pred = Predicate.create(cond, lr.output)
      pred.initialize(0)
      LocalRelation(lr.output, lr.data.filter(pred.eval), lr.isStreaming)
  }
}
