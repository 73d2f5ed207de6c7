package graft.plans

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Execution-metrics capture — the MEASURED twin of [[PlanDescriber]]'s
  * structural pins. A plan string can promise map-side partial
  * aggregation or a broadcast join; this actually counts the shuffled
  * bytes/records of a run, which is the quantity that decides whether a
  * query survives 100 TB. Used by MetricsSpec to assert data-volume
  * invariants (e.g. a two-phase aggregate shuffles orders of magnitude
  * fewer records than it scans) as regression gates — the Spark analog of
  * the reference benchmarks' per-query instrumentation.
  */
object Metrics {

  /** Totals across all tasks that ended while the body ran. */
  final case class RunMetrics(
      shuffleWriteBytes: Long, shuffleWriteRecords: Long,
      shuffleReadBytes: Long, shuffleReadRecords: Long,
      spillBytes: Long,
      inputBytes: Long, inputRecords: Long,
      tasks: Long)

  /** Run `body`, return its result plus the task metrics it generated.
    * Listener events are posted asynchronously, so the bus is drained
    * before reading the counters. Scope is the whole context — run one
    * measured body at a time (tests are sequential; concurrent jobs
    * would fold into the same totals). */
  def measure[T](spark: SparkSession)(body: => T): (T, RunMetrics) = {
    val swb, swr, srb, srr, sp, ib, ir, nt = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          swb.add(m.shuffleWriteMetrics.bytesWritten)
          swr.add(m.shuffleWriteMetrics.recordsWritten)
          srb.add(m.shuffleReadMetrics.totalBytesRead)
          srr.add(m.shuffleReadMetrics.recordsRead)
          sp.add(m.memoryBytesSpilled + m.diskBytesSpilled)
          ib.add(m.inputMetrics.bytesRead)
          ir.add(m.inputMetrics.recordsRead)
          nt.add(1)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val out = body
      // the listener bus is async and its drain API is private[spark]:
      // quiesce by polling until the task counter holds still for 3
      // consecutive 50 ms windows (a single stable window can miss
      // late-arriving events on a loaded machine), bounded at 3 s
      var last = -1L
      var stable = 0
      var spins = 0
      while (stable < 3 && spins < 60) {
        Thread.sleep(50)
        val cur = nt.sum
        if (cur == last) stable += 1 else { stable = 0; last = cur }
        spins += 1
      }
      (out, RunMetrics(
        swb.sum, swr.sum, srb.sum, srr.sum, sp.sum, ib.sum, ir.sum, nt.sum))
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
