package graft

/** Proves the statistics toggle has SUBSTANCE: with analyzed tables the
  * cost-based optimizer picks a different (better) join order than the
  * SQL-text order, and turning CBO off reverts to text order — the Spark
  * mirror of the reference's `--disable-statistics` benchmark flag
  * (reference: benchmarks/src/tpch/run.rs:90-92,118). */
class StatsSpec extends SparkSpec {

  private lazy val registered: Unit =
    Catalog.registerAnalyzed(spark, sf0001,
      names = Seq("nation", "customer", "orders", "lineitem"))

  // deliberately bad text order: the two fact tables first, the
  // 25-row nation (filtered to 1 row — column stats know that) last
  private val sql = """
    SELECT count(*) AS n
    FROM graft_stats.lineitem l
    JOIN graft_stats.orders   o ON l.l_orderkey  = o.o_orderkey
    JOIN graft_stats.customer c ON o.o_custkey   = c.c_custkey
    JOIN graft_stats.nation   n ON c.c_nationkey = n.n_nationkey
    WHERE n.n_name = 'FRANCE'"""

  /** Leaf-relation order of the optimized plan (left-deep join order). */
  private def leafOrder(cbo: Boolean): Seq[String] = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> spark.conf.get(k))
    keys.foreach(k => spark.conf.set(k, cbo.toString))
    try spark.sql(sql).queryExecution.optimizedPlan.collectLeaves()
      .map(_.toString.linesIterator.next())
      .map(l => "(nation|customer|orders|lineitem)".r.findFirstIn(l).getOrElse(l))
    finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("ANALYZE TABLE populates row-count + column stats") {
    registered
    val stats = spark.table("graft_stats.nation")
      .queryExecution.optimizedPlan.stats
    // rowCount is only surfaced from catalog stats (not size estimation),
    // so its presence proves ANALYZE ran and the CBO can see it
    assert(stats.rowCount.contains(BigInt(25)),
      s"expected analyzed rowCount=25, got ${stats.rowCount}")
    val described = spark.sql(
      "DESCRIBE EXTENDED graft_stats.nation n_name").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(described.get("distinct_count").exists(_.toLong >= 24),
      s"no NDV column stat for n_name: $described")
  }

  test("CBO + stats changes the join order vs stats-off text order") {
    registered
    val off = leafOrder(cbo = false)
    val on  = leafOrder(cbo = true)
    // text order is preserved without CBO…
    assert(off === Seq("lineitem", "orders", "customer", "nation"),
      s"stats-off plan should follow SQL text order, got $off")
    // …and the cost-based reorder moves the 1-row-filtered nation off the
    // end (joins it before at least one fact table)
    assert(on !== off, s"CBO with analyzed stats left join order unchanged: $on")
    assert(on.indexOf("nation") < on.indexOf("lineitem"),
      s"CBO should join filtered nation before the lineitem fact, got $on")
  }
}
