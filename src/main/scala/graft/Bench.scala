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
    // one warm-up action so JVM/codegen startup isn't billed to query 1
    Catalog.table(spark, sfDir, "lineitem").count()
    var failed = List.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // "failed" distinguishes time-to-error from a real timing in the record
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
