package graft

/** Benchmark main: times every registry query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract). Mirrors the reference's
  * measurement protocol (reference: benchmarks/src/tpch/run.rs:181-213 —
  * wall-clock around full execution incl. result consumption; per-query
  * timings + aggregate). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    EnvCounters.install(spark)
    // one warm-up action so JVM/codegen startup isn't billed to query 1
    Catalog.table(spark, sfDir, "lineitem").count()
    var failed = List.empty[String]
    // three iterations, min reported: a single-shot timing in a 32-thread
    // shared JVM is vulnerable to one-off GC/compilation spikes (r1 showed
    // a 50-row projection "taking" 65 s once and 0.4 s on re-run); min-of-3
    // matches the repo's bench_results protocol so the driver artifact and
    // the local record are directly comparable
    val iterations = 3
    // optional subset for local iteration (the driver never sets this)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.view.filterKeys(names).toMap)
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val attempts = (1 to iterations).map { _ =>
        val env0 = EnvCounters.snap(spark)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val wall = (System.nanoTime() - t0) / 1e9
        // environment counters AFTER the timed region (r9 verdict item 1:
        // the adjudicated artifact must explain its own per-query deltas)
        val envJson = EnvCounters.deltaJson(env0, EnvCounters.snapAfter(spark))
        (wall, ok, envJson)
      }
      // min over SUCCESSFUL runs only (a fast time-to-error must not stand
      // in for a real timing); "failed" marks queries with NO good run, so
      // a transient single-iteration failure neither poisons the timing
      // nor falsely brands the query broken. A query with zero good runs
      // reports null and contributes NOTHING to total — mixing
      // time-to-error into the headline would make failures look cheap.
      val good = attempts.filter(_._2).map(_._1)
      if (good.isEmpty) failed ::= name
      // fresh-state boundary between queries (see GraftSession.releaseQueryState)
      GraftSession.releaseQueryState(spark)
      val envArr = attempts.map { case (wall, _, env) =>
        // wall repeated inside the env entry so one iteration's counters
        // and its timing read together without cross-indexing
        s"""{"wall_s":$wall,"env":$env}"""
      }.mkString("[", ",", "]")
      (name, if (good.nonEmpty) Some(good.min) else None, envArr)
    }
    val qs = results.map { case (k, v, _) =>
      "\"" + k + "\":" + v.map(_.toString).getOrElse("null")
    }.mkString("{", ",", "}")
    val envJson = results.map { case (k, _, envArr) =>
      "\"" + k + "\":" + envArr
    }.mkString("{", ",", "}")
    val total = results.flatMap(_._2).sum
    // "failed" distinguishes time-to-error from a real timing in the record
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"iterations":$iterations,"sf":"$sfDir","env":$envJson}""")
    spark.stop()
  }
}
