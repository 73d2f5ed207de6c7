package graft

import org.apache.spark.scheduler._

/** One-off: per-job timing breakdown for one registry query (floor
  * analysis). usage: JobProbe <sfDir> <queryName> */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val spark = GraftSession.get()
    Catalog.table(spark, sfDir, "lineitem").count()
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    // query-relative start/end offsets so job OVERLAP is visible: two
    // broadcast builds materializing concurrently show interleaved
    // windows, a serialized chain shows back-to-back ones (r9 verdict
    // item 2 — the fusion target is the serialized case)
    @volatile var queryT0 = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        starts.put(js.jobId, (System.nanoTime(), desc + " stages=" +
          js.stageInfos.map(si => s"${si.name.takeWhile(_ != '\n').take(60)}(${si.numTasks}t)").mkString("|")))
        ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.get(je.jobId)).foreach { case (t0, info) =>
          val now = System.nanoTime()
          events.add(f"job ${je.jobId}%3d [${(t0 - queryT0) / 1e6}%7.1f -> " +
            f"${(now - queryT0) / 1e6}%7.1f ms]  $info")
        }
        ()
      }
    })
    val fn = SparkEntry.queries(name)
    // driver-thread stack sampler (JOBPROBE_STACKS=1): job windows only
    // show SCHEDULED work; the dead windows between a query's jobs are
    // driver-side (planning/codegen/broadcast builds) and need stacks to
    // attribute (r11: q07-class queries showed 0.3-0.6 s of unexplained
    // pre-main-job driver time)
    val sampleStacks = sys.env.contains("JOBPROBE_STACKS")
    for (variant <- Seq("aqe", "gate")) {
      if (variant == "gate") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
      }
      for (i <- 1 to 3) {
        events.clear()
        val samples = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
        val mainThread = Thread.currentThread()
        @volatile var sampling = sampleStacks && i == 3
        val sampler = new Thread(() => {
          def interesting(st: Array[StackTraceElement]): Option[String] =
            st.find { e =>
              val c = e.getClassName
              c.startsWith("org.apache.spark.sql") ||
                c.startsWith("org.apache.spark.broadcast") ||
                c.startsWith("org.codehaus.janino")
            }.map(e => s"${e.getClassName.split('.').last}.${e.getMethodName}")
          while (sampling) {
            // main thread: where the query body is; broadcast-exchange
            // pool threads: where relation builds/serialization hide
            val frame = interesting(mainThread.getStackTrace)
              .getOrElse(mainThread.getStackTrace.headOption.fold("?")(e =>
                s"${e.getClassName.split('.').last}.${e.getMethodName}"))
            import scala.jdk.CollectionConverters._
            val bcast = Thread.getAllStackTraces.asScala.collect {
              case (t, st) if t.getName.contains("broadcast-exchange") &&
                st.nonEmpty && t.getState == Thread.State.RUNNABLE =>
                t.getName.split('-').last + ":" +
                  interesting(st).getOrElse(
                    s"${st.head.getClassName.split('.').last}.${st.head.getMethodName}")
            }.mkString(" | ")
            samples.add((System.nanoTime(),
              if (bcast.isEmpty) frame else s"$frame  [bcast $bcast]"))
            Thread.sleep(20)
          }
        })
        sampler.setDaemon(true)
        val t0 = System.nanoTime()
        queryT0 = t0
        if (sampling) sampler.start()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        sampling = false
        val total = (System.nanoTime() - t0) / 1e6
        if (i == 3) {
          println(f"[jobprobe] $variant iter$i total=$total%7.1f ms")
          events.forEach(e => println(s"[jobprobe]   $e"))
          if (sampleStacks) {
            import scala.jdk.CollectionConverters._
            samples.asScala.toSeq.foreach { case (t, f) =>
              println(f"[jobprobe]   stack [${(t - t0) / 1e6}%7.1f ms] $f")
            }
          }
          if (sys.env.contains("JOBPROBE_PLAN"))
            println(fn(spark, sfDir).queryExecution.executedPlan.toString)
        }
      }
    }
    spark.stop()
  }
}
