package graft

import graft.plans.AdaptiveGate
import org.apache.spark.sql.functions._

/** Pins the execution-mode gate's conf lifecycle: a small plan flips the
  * session into single-shot mode with input-scaled partitions, reset
  * restores the session's own settings exactly, and the sequence is
  * idempotent (the gate never loses the original values by re-saving its
  * own override). Also pins that the driver-contract layer honors
  * `needsAqe` declarations. */
class AdaptiveGateSpec extends SparkSpec {

  private def conf(k: String) = spark.conf.get(k)

  test("inputBytes reads leaf stats off the analyzed plan") {
    val df = Catalog.table(spark, sf0001, "lineitem")
      .filter(col("l_quantity") > 10).select("l_orderkey")
    val in = AdaptiveGate.inputBytes(df)
    // positive, and within sanity bounds of the on-disk fixture size
    // (stats may apply a compression factor, never zero or absurd)
    assert(in > 10L * 1024)
    assert(in < (1L << 30))
  }

  test("tune flips small plans to single-shot and reset restores exactly") {
    val origParts = conf("spark.sql.shuffle.partitions")
    val df = Catalog.table(spark, sf0001, "orders")
      .groupBy(col("o_orderstatus")).agg(count(lit(1)))
    AdaptiveGate.tune(spark, df)
    assert(conf("spark.sql.adaptive.enabled") === "false")
    assert(conf("spark.sql.constraintPropagation.enabled") === "false")
    val parts = conf("spark.sql.shuffle.partitions").toInt
    assert(parts >= 1 && parts <= origParts.toInt)
    // width floor: narrowing never goes below min(MinPartitions, orig) —
    // the round-9 FloorProbe A/B (SF1: q02 199→157 ms with a floor of 8)
    assert(parts >= math.min(AdaptiveGate.MinPartitions.toInt, origParts.toInt))
    // second tune on another small plan must keep the ORIGINAL saved
    // partitions, not re-save the gate's own override
    AdaptiveGate.tune(spark,
      Catalog.table(spark, sf0001, "customer").select("c_custkey"))
    AdaptiveGate.reset(spark)
    assert(conf("spark.sql.shuffle.partitions") === origParts)
    assert(conf("spark.sql.adaptive.enabled") === "true")
    assert(conf("spark.sql.constraintPropagation.enabled") === "true")
    // reset with no override held is a no-op
    AdaptiveGate.reset(spark)
    assert(conf("spark.sql.shuffle.partitions") === origParts)
  }

  test("inputBytes counts leaves inside subquery expressions") {
    Catalog.table(spark, sf0001, "orders").createOrReplaceTempView("ag_o")
    Catalog.table(spark, sf0001, "lineitem").createOrReplaceTempView("ag_l")
    val outerOnly = spark.sql("SELECT o_orderkey FROM ag_o")
    val withSub = spark.sql(
      """SELECT o_orderkey FROM ag_o o WHERE EXISTS
         (SELECT 1 FROM ag_l l WHERE l.l_orderkey = o.o_orderkey)""")
    val lineitemBytes =
      AdaptiveGate.inputBytes(Catalog.table(spark, sf0001, "lineitem"))
    // the subquery's lineitem scan must be visible to the estimate —
    // before the fix the EXISTS plan counted only the orders leaf
    assert(AdaptiveGate.inputBytes(withSub) >=
      AdaptiveGate.inputBytes(outerOnly) + lineitemBytes)
  }

  test("tune keeps FULL width for small plans with non-file leaves") {
    val origParts = conf("spark.sql.shuffle.partitions")
    // checkpointed lineage = LogicalRDD leaf: bytes no longer proxy the
    // compute behind it (k-means/PQ training shape) — single-shot still
    // saves the AQE stage rounds, but the width must NOT be narrowed by
    // the (meaningless) leaf-byte estimate
    val ck = Catalog.table(spark, sf0001, "embeddings").localCheckpoint()
    AdaptiveGate.tune(spark, ck.groupBy().count())
    assert(conf("spark.sql.adaptive.enabled") === "false")
    assert(conf("spark.sql.shuffle.partitions") === origParts)
    // a subsequent file-backed small plan re-applies byte-sizing off the
    // SAME saved original (no override leakage between modes). With the
    // round-9 width floor the clamp is min(orig, max(floor, in/8MB)) —
    // at this spec session's orig=4 (< MinPartitions) that equals orig,
    // so pin the exact formula rather than strict narrowing
    val fileDf = Catalog.table(spark, sf0001, "orders").select("o_orderkey")
    AdaptiveGate.tune(spark, fileDf)
    val expected = math.min(origParts.toLong, math.max(
      AdaptiveGate.MinPartitions,
      AdaptiveGate.inputBytes(fileDf) / AdaptiveGate.BytesPerPartition)).toInt
    assert(conf("spark.sql.shuffle.partitions").toInt === expected)
    AdaptiveGate.tune(spark, ck.groupBy().count())
    assert(conf("spark.sql.shuffle.partitions") === origParts)
    AdaptiveGate.reset(spark)
    assert(conf("spark.sql.adaptive.enabled") === "true")
    assert(conf("spark.sql.shuffle.partitions") === origParts)
  }

  test("contract layer resets conf BEFORE every query body (eager phase)") {
    val origParts = conf("spark.sql.shuffle.partitions")
    // leave the session gated, as a prior small query would
    AdaptiveGate.tune(spark,
      Catalog.table(spark, sf0001, "orders").select("o_orderkey"))
    assert(conf("spark.sql.adaptive.enabled") === "false")
    var seenAdaptive: String = null
    var seenParts: String = null
    val probe = GQuery("spec_probe", "observes conf during eager build",
      (s, dir) => {
        // this is the construction/eager phase: localCheckpoint or store
        // writes here must run under the session's own conf
        seenAdaptive = s.conf.get("spark.sql.adaptive.enabled")
        seenParts = s.conf.get("spark.sql.shuffle.partitions")
        Catalog.table(s, dir, "region")
      }, None)
    SparkEntry.tuned(probe)(spark, sf0001)
    assert(seenAdaptive === "true",
      "query body inherited the previous plan's single-shot conf")
    assert(seenParts === origParts)
    AdaptiveGate.reset(spark)
  }

  test("SparkEntry honors needsAqe: adaptive demos run under full AQE") {
    val origParts = conf("spark.sql.shuffle.partitions")
    // leave the session in gated state, as a prior small query would
    AdaptiveGate.tune(spark,
      Catalog.table(spark, sf0001, "orders").select("o_orderkey"))
    assert(conf("spark.sql.adaptive.enabled") === "false")
    val aqeNames = Registry.all.filter(_.needsAqe).map(_.name)
    assert(aqeNames.nonEmpty, "expected at least one needsAqe query")
    // constructing a needsAqe query through the contract layer restores
    // full-AQE defaults BEFORE its body runs
    SparkEntry.queries(aqeNames.head)(spark, sf0001)
    assert(conf("spark.sql.adaptive.enabled") === "true")
    assert(conf("spark.sql.shuffle.partitions") === origParts)
  }
}
