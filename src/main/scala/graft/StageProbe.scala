package graft

import org.apache.spark.scheduler._

/** Per-stage execution profile for one registry query: wall window,
  * summed task run time, JVM GC time, shuffle read/write bytes, spill,
  * and peak execution memory — the attribution layer between JobProbe's
  * job windows and a JFR allocation profile. Built for the r13 minhash
  * heavy-tail question (300×: 77.7 s task GC of 99 s wall — WHICH stage
  * pays it?); generic over any registry query.
  *
  * usage: StageProbe <sfDir> <queryName> [iters=1]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: StageProbe <sfDir> <queryName> [iters]")
    val (dir, name) = (args(0), args(1))
    val iters = args.lift(2).map(_.toInt).getOrElse(1)
    val spark = GraftSession.get()
    spark.sparkContext.setLogLevel("WARN")
    val q = Registry.byName(name)

    case class Row(id: Int, name: String, tasks: Int, wallMs: Long,
        runMs: Long, gcMs: Long, cpuMs: Long, readMB: Double, writeMB: Double,
        spillMB: Double, peakMB: Double, outRows: Long)
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[Row]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(-1L)
        rows.add(Row(si.stageId, si.name.takeWhile(_ != '\n').take(90),
          si.numTasks, wall, m.executorRunTime, m.jvmGCTime,
          m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
          m.peakExecutionMemory / 1e6,
          m.outputMetrics.recordsWritten max m.shuffleWriteMetrics.recordsWritten))
        ()
      }
    })

    for (i <- 1 to iters) {
      rows.clear()
      val t0 = System.nanoTime()
      q.run(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async; stage-completed events can trail the job —
      // a short settle sleep is enough for a probe (listenerBus is
      // private[spark])
      Thread.sleep(1500)
      import scala.jdk.CollectionConverters._
      val rs = rows.asScala.toSeq.sortBy(_.id)
      println(f"[stageprobe] $name iter=$i wall=$wall%.1f s  " +
        f"sum_run=${rs.map(_.runMs).sum / 1e3}%.1f s  " +
        f"sum_gc=${rs.map(_.gcMs).sum / 1e3}%.1f s  " +
        f"sum_cpu=${rs.map(_.cpuMs).sum / 1e3}%.1f s")
      rs.foreach { r =>
        println(f"[stage ${r.id}%3d] ${r.tasks}%4dt wall=${r.wallMs / 1e3}%7.1fs " +
          f"run=${r.runMs / 1e3}%8.1fs gc=${r.gcMs / 1e3}%7.1fs " +
          f"cpu=${r.cpuMs / 1e3}%8.1fs rd=${r.readMB}%8.1fMB wr=${r.writeMB}%8.1fMB " +
          f"spill=${r.spillMB}%6.0fMB peak=${r.peakMB}%6.0fMB outRows=${r.outRows}%d  ${r.name}")
      }
      GraftSession.releaseQueryState(spark)
    }
    spark.stop()
  }
}
