package graft

import org.apache.spark.sql.functions._

/** The 100 TB approximation path, quantified. Exact count(distinct) and
  * exact percentile are shuffle/sort-expensive at scale; their sketch
  * twins (HyperLogLog++, an ε-quantile summary) are single-pass algebraic
  * aggregates (constant-size partial state, partial+final merge). These
  * specs pin (a) the error against the exact answer on real data and
  * (b) the two-phase plan shape that makes them scale.
  *
  * Sketches are engine-specific (Spark's HLL++ ≠ DuckDB's HLL), so this is
  * deliberately a tolerance differential in-engine rather than a DuckDB
  * hash oracle — same rationale as the ANN recall quantification
  * (DifferentialSpec). */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct: within 5% of exact, two-phase aggregate plan") {
    val l = Catalog.table(spark, sf0001, "lineitem")
    val exact = l.select(countDistinct(col("l_partkey"))).head.getLong(0)
    val approxDf = l.select(
      approx_count_distinct(col("l_partkey")).as("acd"))
    val approx = approxDf.head.getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    info(f"approx_count_distinct: exact=$exact approx=$approx relErr=$relErr%.4f")
    assert(relErr <= 0.05, f"HLL++ drifted beyond 5%%: $relErr%.4f")
    // algebraic: partial + final HashAggregate, no sort, no full shuffle of rows
    val plan = approxDf.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      s"expected partial+final aggregate:\n$plan")
    assert(!plan.contains("Sort "), "sketch aggregation must not sort")
  }

  test("approx_percentile: within rank tolerance of exact percentile per group") {
    val l = Catalog.table(spark, sf0001, "lineitem")
    val both = l.groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("exact_p50"),
        // accuracy 10000 => rank error <= n/10000; quantity domain is 1..50
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("apx_p50"),
        expr("percentile(l_quantity, 0.95)").as("exact_p95"),
        expr("approx_percentile(l_quantity, 0.95, 10000)").as("apx_p95"))
      .collect()
    both.foreach { r =>
      val (e50, a50) = (r.getDouble(1), r.getDouble(2))
      val (e95, a95) = (r.getDouble(3), r.getDouble(4))
      info(f"${r.getString(0)}: p50 exact=$e50%.2f approx=$a50%.2f; " +
        f"p95 exact=$e95%.2f approx=$a95%.2f")
      // integer-valued domain: the sketch answer must land within one
      // neighboring value of the interpolated exact answer
      assert(math.abs(a50 - e50) <= 1.0, s"p50 drift: $a50 vs $e50")
      assert(math.abs(a95 - e95) <= 1.0, s"p95 drift: $a95 vs $e95")
    }
  }

  test("builtin stddev/var/corr/covar agree with x_stats_agg's exact-moment closed forms") {
    // x_stats_agg computes the statistics from exact BIGINT moments (the
    // only hash-gateable form); the BUILTIN aggregates use Welford-style
    // merges whose result is merge-order-dependent at the ulp level. This
    // pins the builtins to the exact closed forms within a float tolerance
    // — proving the builtin surface without putting its nondeterminism
    // behind the oracle hash gate.
    val exact = Registry.byName("x_stats_agg").run(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val l = Catalog.table(spark, sf0001, "lineitem")
    val q = col("l_quantity").cast("double")
    val n = col("l_linenumber").cast("double")
    val builtin = l.groupBy(col("l_returnflag"))
      .agg(stddev_samp(q).as("sd"), var_samp(q).as("vr"),
        corr(q, n).as("cr"), covar_samp(q, n).as("cv"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(exact.keySet === builtin.keySet)
    exact.foreach { case (k, (sd, vr, cr, cv)) =>
      val (bsd, bvr, bcr, bcv) = builtin(k)
      assert(math.abs(sd - bsd) < 2e-6, s"$k stddev: $sd vs $bsd")
      assert(math.abs(vr - bvr) < 2e-5, s"$k var: $vr vs $bvr")
      assert(math.abs(cr - bcr) < 2e-6, s"$k corr: $cr vs $bcr")
      assert(math.abs(cv - bcv) < 2e-6, s"$k covar: $cv vs $bcv")
    }
  }

  test("runtime bloom filter injects on a selective join (row-level runtime pruning)") {
    // At 100 TB the probe side of a selective join should not shuffle rows
    // the build side will discard: Spark's InjectRuntimeFilter plants a
    // bloom_filter_might_contain predicate on the probe side, built from
    // the filtered build side. Local parquet is far below the default
    // size thresholds, so the spec lowers them to make the optimizer see
    // "big probe / small selective build" — the 100 TB geometry.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0), "1")       // any probe-side scan qualifies
      conf.set(keys(1), "100MB")   // build side comfortably under
      // broadcast joins skip bloom injection (the broadcast itself prunes);
      // the 100 TB geometry being modeled is build side too big to
      // broadcast but still selective — force the shuffle-join path
      conf.set(keys(2), "-1")
      // orders, not part, as the build side: part at sf0.001 is under the
      // Catalog tiny-dim inline threshold (r10) and a LocalRelation build
      // side has no scan for InjectRuntimeFilter's size heuristics — the
      // 100 TB geometry being modeled has a FILE-BACKED selective build
      val o = Catalog.table(spark, sf0001, "orders")
        .filter(col("o_orderstatus") === "P") // selective build side
      val l = Catalog.table(spark, sf0001, "lineitem")
      val joined = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${optimized.take(3000)}")
      joined.collect() // and it must still execute correctly
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("x_bloom_join: no false negatives, fp rate within 3x of (1-e^-kn/m)^k") {
    val r = queries.SketchOps.bloomJoin.run(spark, sf0001).head
    val (nFact, nPass, nTrue, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    info(s"bloom: fact=$nFact pass=$nPass true=$nTrue fp=$nFp")
    // contract 1: the prefilter may only SHRINK the fact side — every true
    // match must pass (a false negative would break join correctness)
    assert(nPass >= nTrue, "bloom dropped a true match (false negative)")
    assert(nPass <= nFact)
    // contract 2: fp rate in the predicted neighborhood (n keys unknown
    // here; bound loosely — the oracle hash pins the exact arithmetic)
    val fpRate = r.getDouble(4)
    assert(fpRate >= 0.0 && fpRate < 0.5, s"fp rate out of range: $fpRate")
  }

  test("x_histo_quantile: estimate within one bucket width of exact") {
    val rows = queries.SketchOps.histoQuantile.run(spark, sf0001).collect()
    assert(rows.length === 3)
    val o = Catalog.table(spark, sf0001, "orders").agg(
      min(col("o_totalprice")), max(col("o_totalprice"))).head
    val width = (o.getDouble(1) - o.getDouble(0)) / 256
    rows.foreach { r =>
      val (q, est, exact) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      info(f"q=$q est=$est%.2f exact=$exact%.2f width=$width%.2f")
      // linear interpolation inside the landing bucket can miss by at most
      // the bucket width (value distribution inside a bucket is unknown)
      assert(math.abs(est - exact) <= width,
        s"histogram quantile q=$q drifted beyond one bucket: $est vs $exact")
    }
  }
}
