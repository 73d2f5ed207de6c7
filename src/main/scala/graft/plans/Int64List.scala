package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Whole-operator extension demo — the Spark analog of the reference's
  * custom `Int64ListExec` operator, which proves that user-defined
  * execution nodes flow through the engine end-to-end (reference:
  * tests/custom_extension_codec.rs:159-263; there the proof needs a
  * protobuf codec so the node survives the wire — on Spark the class is
  * on every executor's classpath, so the whole codec layer disappears
  * and only the planner hookup remains).
  *
  * Pattern demonstrated: custom `LogicalPlan` leaf → `Strategy` →
  * `SparkPlan` with a real `doExecute`, injected via
  * `SparkSessionExtensions.injectPlannerStrategy`.
  */
/** `output` is a constructor parameter (the LocalRelation pattern): a
  * body-val would mint fresh exprIds on every plan copy and break
  * attribute binding downstream. */
case class Int64ListPlan(values: Seq[Long], numSlices: Int,
    output: Seq[Attribute] = Seq(
      AttributeReference("value", LongType, nullable = false)()))
  extends LeafNode
  with org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation {
  override def newInstance(): Int64ListPlan =
    copy(output = output.map(_.newInstance()))
  // accurate stats let the optimizer broadcast this side of joins
  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = BigInt(values.size.toLong) * 8,
      rowCount = Some(BigInt(values.size.toLong)))
}

case class Int64ListExec(values: Seq[Long], numSlices: Int,
    output: Seq[Attribute]) extends LeafExecNode {
  override protected def doExecute(): RDD[InternalRow] =
    session.sparkContext
      .parallelize(values, math.max(numSlices, 1))
      .mapPartitions { it =>
        // physical operators hand UnsafeRows to the exchange layer
        val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(Array[org.apache.spark.sql.types.DataType](LongType))
        it.map(v => proj(InternalRow(v)).copy())
      }
  override def simpleString(maxFields: Int): String =
    s"Int64ListExec [${values.take(5).mkString(",")}…] slices=$numSlices"
}

/** Plans the custom logical node; everything else falls through. */
object Int64ListStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Int64ListPlan(values, n, out) =>
      Int64ListExec(values, n, out) :: Nil
    case _ => Nil
  }
}

object Int64List {

  /** Injection entry (≡ add_user_codec, reference:
    * src/user_provided_codec.rs:39-83 — here it is one planner hook). */
  def inject(ext: SparkSessionExtensions): Unit =
    ext.injectPlannerStrategy(_ => Int64ListStrategy)

  /** Idempotent per-session registration + DataFrame constructor. */
  def df(spark: SparkSession, values: Seq[Long], numSlices: Int = 4) = {
    if (!spark.experimental.extraStrategies.contains(Int64ListStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ Int64ListStrategy
    }
    org.apache.spark.sql.graft.GraftBridge
      .ofRows(spark, Int64ListPlan(values, numSlices))
  }
}
