package graft

import graft.functions.Aggregators
import graft.util.Num
import org.apache.spark.sql.functions._

/** Typed-UDAF and bucketed-table specs. */
class AggregatorsSpec extends SparkSpec {

  import spark.implicits._

  test("Fix6Sum aggregator matches Num.dsum bit-exactly at any partitioning") {
    val xs = (1 to 5000).map(i => math.cos(i) * 1e4)
    val viaAgg = xs.toDS().repartition(13)
      .select(udaf(Aggregators.Fix6Sum).apply($"value")).head.getDouble(0)
    val viaNum = xs.toDF("x").agg(Num.dsum($"x")).head.getDouble(0)
    assert(viaAgg === viaNum)
  }

  test("KMin keeps the k smallest distinct values under any merge order") {
    val xs = Seq(9L, 3L, 7L, 3L, 1L, 8L, 2L, 1L, 5L)
    val out = xs.toDS().repartition(4)
      .select(udaf(Aggregators.KMin(3)).apply($"value")).head.getSeq[Long](0)
    assert(out === Seq(1L, 2L, 3L))
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = Catalog.table(spark, sf0001, "orders")
    val l = Catalog.table(spark, sf0001, "lineitem")
    Catalog.writeBucketed(o, "orders_b", 4, "o_orderkey")
    Catalog.writeBucketed(l, "lineitem_b", 4, "l_orderkey")
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)))
    // co-located: only the post-join aggregation may exchange; the join
    // inputs read pre-bucketed files with no shuffle
    val plan = joined.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1, s"expected at most the post-agg exchange, got $shuffles:\n$plan")
    assert(joined.count() > 0)
  }

  test("x_bucket_join registry query: sort-merge join with no exchange below the join") {
    // the oracle gate proves x_bucket_join's VALUES equal the plain
    // join; this pins the MECHANISM — the bucketed layout must satisfy
    // the join's distribution requirement from the files
    val q = Registry.byName("x_bucket_join").run(spark, sf0001)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n${plan.take(1500)}")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles <= 1,
      s"bucketed join must not exchange below the join, got $shuffles:\n$plan")
  }
}
