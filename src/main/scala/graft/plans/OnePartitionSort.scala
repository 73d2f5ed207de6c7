package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Project, Repartition, Sort}
import org.apache.spark.sql.catalyst.rules.Rule

/** In the single-shot small-plan regime, plan a GLOBAL sort as a
  * one-partition shuffle plus local sort — the static equivalent of the
  * coalescing AQE would have applied to a tiny sorted output.
  *
  * Why: a global Sort into >1 partition plans a range exchange, and
  * `RangePartitioner` runs a separate SAMPLING JOB that re-executes the
  * sort's child (the r9 per-doc-feature trap, now measured again on the
  * SF1 floor: q02's presentation sort re-ran the whole probe pipeline as
  * an extra 10-task job — a third of its scheduled work for a 460-row
  * output). Shuffling those rows round-robin into ONE partition and
  * sorting locally yields the identical globally-sorted result with no
  * sampling job and no range exchange; the upstream pipeline keeps its
  * full scan width because the single partition starts AT the shuffle
  * boundary.
  *
  * Scope: fires only while [[AdaptiveGate]] owns the execution (its
  * marker conf is set exactly for plans whose leaf bytes are under
  * [[AdaptiveGate.SmallPlanBytes]]) — a large plan's sorted output
  * genuinely wants a parallel range sort, and such plans run under full
  * AQE where this rule never engages. */
object OnePartitionSort extends Rule[LogicalPlan] {

  /** Operational kill switch (GRAFT_NO_1PSORT=1), for A/B measurement and
    * as the escape hatch — same pattern as GRAFT_NO_AUTOTUNE/NO_INLINE. */
  private val disabled: Boolean =
    sys.env.get("GRAFT_NO_1PSORT").contains("1")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (disabled ||
      conf.getConfString("graft.autotune.origPartitions", "").isEmpty) plan
    else {
      // a Sort feeding a Limit must stay global: the physical planner
      // pattern-matches Limit(Sort(global=true)) (also through a
      // Project) into TakeOrderedAndProject — the top-k operator the
      // q03/q10/q18 family depends on — and rewriting the sort here
      // would demote those to a full sort + limit
      val protectedSorts = plan.collect {
        case GlobalLimit(_, LocalLimit(_, s: Sort)) => s
        case GlobalLimit(_, LocalLimit(_, Project(_, s: Sort))) => s
      }
      plan.transformUp {
        case s @ Sort(order, true, child, hint)
            if !protectedSorts.exists(_ eq s) =>
          Sort(order, global = false,
            Repartition(1, shuffle = true, child), hint)
      }
    }
}
