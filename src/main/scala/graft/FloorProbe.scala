package graft

/** One-off profiling harness for the short-query scheduling floor: times a
  * query set under several RUNTIME conf variants (all SQL confs, so one
  * JVM/session serves every variant) and reports per-query min plus the
  * Spark job count per execution — the job count is the floor's unit of
  * cost (every AQE stage round, broadcast build and subquery is one
  * scheduled job; at ≤400 ms absolute the scheduling rounds dominate,
  * reference analog: the bench protocol in benchmarks/src/util/run.rs).
  *
  * The "gateNmb" variants simulate the small-plan single-shot path:
  * adaptive off + shuffle partitions = clamp(inputBytes / N MB, 1, cpus).
  *
  * usage: FloorProbe <sfDir> [q1,q2,...]
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: FloorProbe <sfDir> [q1,q2,...]")
    val sfDir = args(0)
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.filter(_.startsWith("q")).toSeq.sorted
    val spark = GraftSession.get()
    Catalog.table(spark, sfDir, "lineitem").count() // warm-up

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      })

    def inputBytes(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.optimizedPlan.collectLeaves()
        .map(_.stats.sizeInBytes).sum.min(BigInt(Long.MaxValue)).toLong

    // (name, Some((bytesPerPartition, minParts)), extra confs) — extras
    // probe driver-side planning cost cuts on top of the single-shot path
    val variants: Seq[(String, Option[(Long, Int)], Map[String, String])] = Seq(
      ("baseline", None, Map.empty),
      ("gate8mb", Some((8L << 20, 1)), Map.empty),
      ("gate8f4", Some((8L << 20, 4)),
        Map("spark.sql.constraintPropagation.enabled" -> "false")),
      ("gate8f8", Some((8L << 20, 8)),
        Map("spark.sql.constraintPropagation.enabled" -> "false")),
      ("gate8f16", Some((8L << 20, 16)),
        Map("spark.sql.constraintPropagation.enabled" -> "false")))

    val results = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, Double]]
    val extraDefaults = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "10485760",
      "spark.sql.constraintPropagation.enabled" -> "true")
    for ((vname, target, extra) <- variants) {
      for (name <- names) {
        val fn = SparkEntry.queries(name)
        val df0 = fn(spark, sfDir)
        target match {
          case Some((t, floor)) =>
            val in = inputBytes(df0)
            val parts = math.max(floor.toLong, math.min(32L, in / t)).toInt
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
          case None =>
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set("spark.sql.shuffle.partitions", "32")
        }
        extraDefaults.foreach { case (k, v) =>
          spark.conf.set(k, extra.getOrElse(k, v))
        }
        val runs = (1 to 4).map { _ =>
          jobs.set(0)
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val ms = (System.nanoTime() - t0) / 1e6
          (ms, jobs.get())
        }
        val best = runs.drop(1).minBy(_._1) // drop iter-1 (codegen warm)
        results.getOrElseUpdate(name,
          scala.collection.mutable.Map.empty)(vname) = best._1
        println(f"[probe] $vname%-10s $name%-30s ${best._1}%8.1f ms  jobs=${best._2}")
      }
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    println("[probe] === summary (ms, and ratio vs baseline) ===")
    for (name <- names) {
      val r = results(name)
      val b = r("baseline")
      val line = variants.map(_._1).map { v =>
        f"$v=${r(v)}%7.1f(${r(v) / b}%4.2f)"
      }.mkString("  ")
      println(f"[probe] $name%-30s $line")
    }
    spark.stop()
  }
}
