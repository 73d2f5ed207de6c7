package graft

/** Runtime skew handling — the AQE twin of x_salted_join's plan-level
  * salting. The x_skew_aqe query remaps ~80% of lineitem rows onto one
  * hot supplier key and leaves the join a plain sort-merge; this suite
  * pins that OptimizeSkewedJoin actually SPLITS the oversized partition
  * (`skew=true` in the final adaptive plan) under thresholds scaled to
  * test data — production defaults (256 MB threshold) never trigger at
  * test scale, so without the scaled pin the capability would be
  * declared, not proven — and that the split is result-invisible
  * (identical rows with skew handling on and off).
  *
  * Which form to use at 100 TB: AQE splitting needs no key knowledge,
  * costs nothing on balanced data, and covers sort-merge/shuffled-hash
  * joins at runtime; explicit salting (x_salted_join) is the plan-level
  * form that also covers grouped aggregation and pays its dim-replication
  * join always. Default to AQE; salt only keys you KNOW are pathological.
  */
class SkewJoinSpec extends SparkSpec {

  private val tuned = Map(
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // skew if size > max(threshold, factor * median): scale both floors
    // down so the sf0.001 hot partition (~100 KB of map output vs ~1 KB
    // median) crosses them the way a hot 10 GB partition would at 100 TB
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k")

  test("x_skew_aqe: OptimizeSkewedJoin splits the hot partition, results unchanged") {
    val saved = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    val (splitRows, plan) =
      try {
        val df = Registry.byName("x_skew_aqe").run(spark, sf0001)
        val rows = df.collect()
        (rows, df.queryExecution.executedPlan.toString)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    assert(plan.contains("skew=true"),
      s"AQE skew split did not fire — no skew=true in the final plan:\n" +
        plan.take(2000))
    // default-conf run (no forced split at this scale): same rows
    val plainRows = Registry.byName("x_skew_aqe").run(spark, sf0001).collect()
    assert(splitRows.toSeq === plainRows.toSeq,
      "runtime skew splitting changed query results")
  }

  test("x_rebalance_write: REBALANCE splits the hot partition's files on write") {
    import org.apache.spark.sql.functions._
    val adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val rb = "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled"
    val saved = Seq(adv, rb).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set(adv, "16k")
    spark.conf.set(rb, "true")
    try {
      val base = java.nio.file.Files
        .createTempDirectory("graft-rebal-spec").toString
      val root = base + "/orders_rb"
      // staged multi-file source: skew splits are map-index ranges, and an
      // in-plan repartition would be collapsed into the rebalance exchange
      Catalog.table(spark, sf0001, "orders")
        .select(col("o_orderkey"), col("o_totalprice"),
          when(expr("conv(substring(md5(cast(concat_ws(':', 'rb', o_orderkey)" +
            " as binary)), 1, 15), 16, 10)").cast("long") % 5 < 4,
            lit("hot")).otherwise(col("o_orderpriority")).as("seg"),
          md5(col("o_orderkey").cast("string")).as("fp"))
        .repartition(32)
        .write.mode("overwrite").parquet(base + "/src")
      spark.read.parquet(base + "/src").hint("rebalance", col("seg"))
        .write.mode("overwrite").partitionBy("seg").parquet(root)
      def partFiles(d: String): Int =
        Option(new java.io.File(s"$root/$d").listFiles())
          .map(_.count(_.getName.startsWith("part-"))).getOrElse(0)
      val hot = partFiles("seg=hot")
      assert(hot >= 2,
        s"hot partition written as $hot file(s) — rebalance skew split " +
          "did not spread the straggler writer")
      val cold = new java.io.File(root).listFiles()
        .filter(f => f.isDirectory && f.getName != "seg=hot")
        .map(f => partFiles(f.getName))
      assert(cold.nonEmpty && cold.forall(_ < hot),
        s"cold partitions (${cold.toSeq}) should need fewer files than hot ($hot)")
      // the layout is result-invisible
      assert(spark.read.parquet(root).count() ===
        Catalog.table(spark, sf0001, "orders").count())
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
