package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.connector.read.streaming.SparkDataStream
import org.apache.spark.sql.execution.LocalTableScanExec

/** A [[LocalTableScanExec]] whose broadcast-collect path is JOB-FREE.
  *
  * `BroadcastExchangeExec` materializes its build side via
  * `child.executeCollectIterator()`, whose SparkPlan default runs a real
  * Spark job over `getByteArrayRdd` — even when the child is a
  * LocalTableScan whose rows already sit on the driver (only
  * `executeCollect`/`executeTake` are overridden upstream). For the
  * catalog-inlined tiny dims (nation/region — see graft.Catalog) that
  * job is ~15-25 ms of pure scheduling per broadcast build, 2-3 times
  * per TPC-H short query: the measured r9 SF1 floor residual. This
  * subclass closes the gap by serving the iterator straight from the
  * driver-resident rows.
  *
  * Lives in the spark.sql package because `executeCollectIterator` is
  * `private[spark]` (same precedent as [[GraftBridge]]). The 3-arg
  * constructor mirrors the case-class parent exactly so
  * `TreeNode.makeCopy` (canonicalization, transforms) can re-instantiate
  * this class reflectively. */
class DriverLocalScanExec(
    output: Seq[Attribute],
    rows: Seq[InternalRow],
    stream: Option[SparkDataStream])
  extends LocalTableScanExec(output, rows, stream) {

  override def executeCollectIterator(): (Long, Iterator[InternalRow]) = {
    val collected = executeCollect() // driver-side unsafe projection, no job
    (collected.length.toLong, collected.iterator)
  }
}
