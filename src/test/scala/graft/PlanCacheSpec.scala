package graft

import graft.plans.PlanCache

/** Prepared-query reuse ([[graft.plans.PlanCache]], r12 verdict item 7):
  * correctness with the cache ON. A prepared plan re-executed repeatedly
  * must (a) produce the same row count every time, (b) dedupe on the
  * canonicalized plan, and (c) leave the ordinary Dataset path producing
  * results identical to a from-scratch build — covering the floor-family
  * queries the feature exists for (q13/q14/q22) plus a broadcast-join and
  * an agg-heavy shape.
  */
class PlanCacheSpec extends SparkSpec {

  override protected def afterAll(): Unit = {
    PlanCache.clear()
    super.afterAll()
  }

  // the whole TPC-H family (every floor/weak row lives here), not just
  // the floor three: cached-plan results must equal fresh builds across
  // every join/agg/window/subquery shape the anchor reports cached
  // numbers for
  private val names = Registry.all.map(_.name).filter(_.startsWith("q")).sorted

  test("prepared re-execution is count-stable and matches the fresh build") {
    for (name <- names) {
      val fresh = Registry.byName(name).run(spark, sf0001)
      val expected = fresh.collect().map(_.toString).sorted
      val p = PlanCache.prepare(Registry.byName(name).run(spark, sf0001))
      val n1 = p.execute() // first execute: full pipeline
      val n2 = p.execute() // reuse: plan + codegen (+ materialized stages)
      val n3 = p.execute()
      assert(n1 == expected.length && n2 == n1 && n3 == n1,
        s"$name prepared counts $n1/$n2/$n3 != fresh ${expected.length}")
      val cachedRows = p.collectRows().map(_.toString).sorted
      assert(cachedRows.sameElements(expected),
        s"$name cached-plan rows differ from fresh build")
    }
  }

  test("cache key is the canonicalized plan: same query builds dedupe") {
    PlanCache.clear()
    val a = PlanCache.prepare(Registry.byName("q14_promo_ratio").run(spark, sf0001))
    // a second build has fresh expression IDs; canonicalization must unify
    val b = PlanCache.prepare(Registry.byName("q14_promo_ratio").run(spark, sf0001))
    assert(a eq b, "two builds of the same query must share one prepared entry")
    assert(PlanCache.size == 1)
    val c = PlanCache.prepare(Registry.byName("q13_outer_join_distribution").run(spark, sf0001))
    assert(!(c eq a) && PlanCache.size == 2)
  }

  test("LRU eviction bounds the cache; an evicted query re-prepares correctly") {
    PlanCache.clear()
    spark.conf.set(PlanCache.CapacityKey, "2")
    try {
      val q13 = () => Registry.byName("q13_outer_join_distribution").run(spark, sf0001)
      val q14 = () => Registry.byName("q14_promo_ratio").run(spark, sf0001)
      val q22 = () => Registry.byName("q22_substring_anti_join").run(spark, sf0001)
      val a = PlanCache.prepare(q13())
      val b = PlanCache.prepare(q14())
      assert(PlanCache.size == 2)
      PlanCache.prepare(q13()) // refresh q13: q14 becomes the LRU entry
      val c = PlanCache.prepare(q22()) // must evict q14, not q13
      assert(PlanCache.size == 2, s"cap 2 exceeded: ${PlanCache.size}")
      assert(PlanCache.prepare(q13()) eq a, "recently-used entry was evicted")
      assert(PlanCache.prepare(q22()) eq c)
      // the evicted q14 re-prepares as a NEW entry and still runs right
      val b2 = PlanCache.prepare(q14())
      assert(!(b2 eq b), "evicted entry must not be resurrected by identity")
      assert(b2.execute() == q14().count(),
        "re-prepared evicted query returns wrong count")
    } finally {
      spark.conf.unset(PlanCache.CapacityKey)
      PlanCache.clear()
    }
  }

  test("changed source files invalidate the prepared entry (fresh-stat signature)") {
    PlanCache.clear()
    val dir = java.nio.file.Files.createTempDirectory("plancache-inval").toString
    spark.range(10).toDF("v").write.mode("overwrite").parquet(dir)
    // one held frame, re-prepared across a data change — the serving
    // pattern the signature exists for (the frame's own file listing is
    // allowed to go stale; the CACHE must not silently serve old rows)
    val df = spark.read.parquet(dir).groupBy().count()
    val a = PlanCache.prepare(df)
    assert(a.collectRows().head.getLong(0) == 10)
    assert(PlanCache.prepare(df) eq a, "unchanged files must hit")
    spark.range(25).toDF("v").write.mode("overwrite").parquet(dir)
    val b = PlanCache.prepare(df)
    assert(!(b eq a), "overwritten source files must re-prepare, not hit")
    assert(PlanCache.size == 1, "stale entry must be replaced, not kept alongside")
    // a FRESH read of the changed dir prepares cleanly and answers new data
    val fresh = PlanCache.prepare(spark.read.parquet(dir).groupBy().count())
    assert(fresh.collectRows().head.getLong(0) == 25)
    PlanCache.clear()
  }

  test("enabled() reads the session conf set by GraftTuning.planCache") {
    assert(!PlanCache.enabled(spark)) // default off
    spark.conf.set("graft.plan.cache", "true")
    try assert(PlanCache.enabled(spark))
    finally spark.conf.set("graft.plan.cache", "false")
  }
}
