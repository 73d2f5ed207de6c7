package graft

/** Partition-layout invariance: representative registry queries must
  * produce IDENTICAL results under radically different shuffle layouts
  * (3 vs 37 partitions) — the property that makes local[32] results
  * transfer to a 1000-executor cluster, and the engine-level analog of
  * the reference's distributed-vs-single-context differential
  * (tests/tpch.rs:168-194). Identity here is exact (string-canonical
  * full rows), which the fixed-point aggregation discipline (Num.fix6)
  * exists to make possible — a raw double sum would already differ
  * between these two layouts. */
class DistributionSpec extends SparkSpec {

  /** One query per operator family with a shuffle in its plan. */
  private val representative = Seq(
    "q01_pricing_summary",   // two-phase agg
    "q05_local_supplier_volume", // multi-join + agg
    "q18_in_subquery_having",    // semi join over grouped having
    "x_window_rank",         // window function
    "e_sessionize",          // lag + grouped agg
    "t_minhash_lsh",         // LSH band join + verify
    "t_pack_sequences",      // running-sum window, integer math
    "v_lsh_ann",             // banded ANN (distinct + joins + topk)
    "v_quantize",            // two-pass calibration + audit
    "p_clean_corpus",        // composed pipeline
    "g_pagerank",            // iterative shuffle loop (fix6 re-quantized)
    "r_dsir_select",         // broadcast-weight scoring + exact fix6 mean
    "e_pattern_match",       // array_sort(collect_list) — THE order-sensitive op
    "m_shard_manifest",      // ordered per-shard digest over collect_list
    "e_out_of_order",        // batch watermarks: tiny global window + broadcast back
    "x_skew_aqe",            // Zipfian SMJ under runtime skew splitting
    "p_novelty_incr")        // cross-frame band join off the signature store

  private def canonical(name: String): Seq[String] = {
    val df = Registry.byName(name).run(spark, sf0001)
    df.collect().map(_.toString).sorted.toSeq
  }

  representative.foreach { name =>
    test(s"$name: identical results at 3 vs 37 shuffle partitions") {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      try {
        spark.conf.set(key, "3")
        val narrow = canonical(name)
        spark.conf.set(key, "37")
        val wide = canonical(name)
        assert(narrow === wide,
          s"$name drifts with partition layout: ${narrow.diff(wide).take(2)}")
        assert(narrow.nonEmpty)
      } finally spark.conf.set(key, prev)
    }
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    // the runtime complement to the deterministic Skew.salted* fallbacks:
    // one key carries 95% of the probe side; with skew-join thresholds
    // scaled to the fixture, AQE must split that partition rather than
    // serialize the join on one reducer — the mechanism that keeps a
    // 100 TB hot key from stalling a stage
    import org.apache.spark.sql.functions._
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.join.preferSortMergeJoin" -> "true")
    val prev = confs.keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val skewed = spark.range(200000).select(
        when(col("id") < 190000, 7L).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = skewed.join(dim, "k")
      assert(j.count() === 190000L) // only the hot key matches the dim
      j.collect() // finalize the adaptive plan
      val s = j.queryExecution.executedPlan.toString
      assert(s.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${s.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
