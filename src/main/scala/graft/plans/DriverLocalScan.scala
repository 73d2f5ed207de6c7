package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.DriverLocalScanExec

/** Plan every non-streaming [[LocalRelation]] as a
  * [[DriverLocalScanExec]] — identical to Spark's built-in
  * LocalTableScanExec in every path except broadcast collection, which
  * becomes job-free (the r9 SF1 short-query floor lever; see the exec
  * node's scaladoc). Registered ahead of the built-in strategies via
  * `spark.experimental.extraStrategies`, so it wins the LocalRelation
  * match; everything else falls through untouched. */
object DriverLocalScan extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LocalRelation(output, data, false, stream) =>
      new DriverLocalScanExec(output, data, stream) :: Nil
    case _ => Nil
  }
}
