package graft

import graft.plans.PlanDescriber
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Pins for the round-10 short-query floor levers: tiny-dim LocalRelation
  * inlining (Catalog), driver-side filter folding (FoldLocalFilters),
  * job-free local broadcast builds (DriverLocalScanExec), and the
  * gate-scoped one-partition presentation sort (OnePartitionSort). */
class LocalDimSpec extends SparkSpec {

  test("tiny dims read as LocalRelations; big tables stay file scans") {
    val nation = Catalog.table(spark, sf0001, "nation")
    assert(nation.queryExecution.analyzed.collectLeaves().forall(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      "nation under the inline threshold should be a LocalRelation")
    assert(nation.count() === 25)
    val lineitem = Catalog.table(spark, sf0001, "lineitem")
    assert(lineitem.queryExecution.analyzed.collectLeaves().exists(
      _.isInstanceOf[org.apache.spark.sql.execution.datasources.LogicalRelation]),
      "lineitem is far over the threshold and must stay a file scan")
  }

  test("deterministic filters over an inlined dim fold driver-side") {
    val r = Catalog.table(spark, sf0001, "region").filter(col("r_name") === "EUROPE")
    val opt = r.queryExecution.optimizedPlan
    assert(!opt.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.Filter]),
      s"Filter(LocalRelation) should fold into the relation:\n$opt")
    assert(r.count() === 1)
  }

  test("broadcast build over an inlined dim schedules ZERO jobs") {
    // euSupp shape: file-backed supplier probe, filtered-region + nation
    // broadcast builds. With DriverLocalScanExec the builds collect
    // driver-side; every job this query runs must be the probe-side save,
    // never a broadcast materialization of a local dim.
    val s = Catalog.table(spark, sf0001, "supplier")
    val n = Catalog.table(spark, sf0001, "nation")
    val r = Catalog.table(spark, sf0001, "region")
    val joined = s
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("n_name"))
    joined.collect() // warm: plan + codegen settled
    var oneTaskJobs = 0
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs += 1
        if (e.stageInfos.map(_.numTasks).sum <= 1) oneTaskJobs += 1
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      joined.collect()
      // drain the async bus far enough to count this query's jobs
      Thread.sleep(300)
      // supplier at sf0.001 is ALSO under the inline threshold, so the
      // whole query may run entirely driver-free of scans — accept any
      // job count as long as no 1-task broadcast-build job appears
      assert(oneTaskJobs === 0,
        s"a local-dim broadcast build scheduled a job ($oneTaskJobs of $jobs)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("gate-scoped global sort becomes 1-partition local sort; ungated keeps range sort") {
    // SparkEntry, not Registry: the AdaptiveGate (whose marker conf scopes
    // OnePartitionSort) is applied by the driver-contract layer only
    val gated = SparkEntry.queries("q02_min_within_group")(spark, sf0001)
    val sGated = PlanDescriber.simpleString(gated)
    assert(!sGated.contains("rangepartitioning"),
      s"gated presentation sort should not range-partition:\n$sGated")
    assert(sGated.contains("Sort"), "the sort itself must survive")
    // and the result is still globally sorted
    val names = gated.select(col("n_name")).collect().map(_.getString(0)).toSeq
    assert(names === names.sorted, "output lost its global order")
  }

  test("top-k Limit(Sort) stays TakeOrderedAndProject under the gate") {
    val df = SparkEntry.queries("q03_topk_revenue")(spark, sf0001)
    val s = PlanDescriber.simpleString(df)
    assert(s.contains("TakeOrderedAndProject"),
      s"top-k must not demote to full sort + limit:\n$s")
  }
}
