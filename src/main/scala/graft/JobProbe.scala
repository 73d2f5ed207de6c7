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
    for (variant <- Seq("aqe", "gate")) {
      if (variant == "gate") {
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.shuffle.partitions", "1")
      }
      for (i <- 1 to 3) {
        events.clear()
        val t0 = System.nanoTime()
        queryT0 = t0
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e6
        if (i == 3) {
          println(f"[jobprobe] $variant iter$i total=$total%7.1f ms")
          events.forEach(e => println(s"[jobprobe]   $e"))
          if (sys.env.contains("JOBPROBE_PLAN"))
            println(fn(spark, sfDir).queryExecution.executedPlan.toString)
        }
      }
    }
    spark.stop()
  }
}
