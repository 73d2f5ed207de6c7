package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Explicit partitioning control — the reference's `Partitioning` surface
  * (reference: src/plan/arrow_flight_read.rs:48-52 consumes Hash /
  * RoundRobinBatch / Unknown) expressed through Spark's repartition
  * operators. Spark inserts exchanges automatically via EnsureRequirements;
  * this DSL is for the cases the planner can't know: pre-partitioning
  * before N downstream co-partitioned joins, spreading skewed scans, or
  * pinning output file counts.
  */
object Partitioning {

  /** Hash partitioning on key columns (≡ Partitioning::Hash(exprs, n)). */
  def hash(df: DataFrame, n: Int, cols: String*): DataFrame =
    df.repartition(n, cols.map(col): _*)

  /** Round-robin redistribution (≡ Partitioning::RoundRobinBatch(n) —
    * Spark deals rows rather than batches; the reference's tests only
    * observe row totals, see SURVEY §2c). */
  def roundRobin(df: DataFrame, n: Int): DataFrame =
    df.repartition(n)

  /** Range partitioning (the global-sort layout). */
  def byRange(df: DataFrame, n: Int, cols: Column*): DataFrame =
    df.repartitionByRange(n, cols: _*)

  /** The physical output partitioning of the planned query — plan
    * introspection parity with the reference's display of partition
    * counts per node. (Under AQE the top node reports Unknown until the
    * final plan exists; the inner current plan carries the real one.) */
  def describe(df: DataFrame): String =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.outputPartitioning.toString
      case p => p.outputPartitioning.toString
    }

  def numPartitions(df: DataFrame): Int =
    // toRdd reads the physical partitioning without building the
    // row-deserializing `.rdd` lineage (same nit as TextOps.spread)
    df.queryExecution.toRdd.getNumPartitions
}
