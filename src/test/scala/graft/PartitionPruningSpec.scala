package graft

import org.apache.spark.sql.functions._

/** Partition-layout pruning — the I/O contract at 100 TB. A hive-layout
  * table (`writePartitioned`) must let (a) a literal filter on the
  * partition column skip non-matching directories at PLAN time and (b) a
  * join against a filtered dimension skip fact partitions at RUN time
  * (dynamic partition pruning). Both are free capabilities of the file
  * source, but like every free capability in this repo they are proven,
  * not assumed.
  */
class PartitionPruningSpec extends SparkSpec {

  private lazy val factPath = {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val o = Catalog.table(spark, sf0001, "orders")
      .withColumn("o_month", month(col("o_orderdate")))
    Catalog.writePartitioned(o, s"$dir/orders_p", "o_month")
    s"$dir/orders_p"
  }

  test("hive layout: one directory per partition value, column readable back") {
    val dirs = new java.io.File(factPath).listFiles().filter(_.isDirectory)
      .map(_.getName).toSeq.sorted
    assert(dirs === (1 to 12).map(m => s"o_month=$m").sorted,
      s"unexpected partition layout: $dirs")
    val back = spark.read.parquet(factPath)
    assert(back.columns.contains("o_month"), "partition column must surface")
    assert(back.count() === Catalog.table(spark, sf0001, "orders").count())
  }

  test("static partition pruning: literal month filter scans exactly one directory") {
    val q = spark.read.parquet(factPath).filter(col("o_month") === 3)
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val s = scan.toString
    assert(s.contains("PartitionFilters") && s.contains("o_month"),
      s"partition filter not applied:\n${s.take(1500)}")
    // the proof that matters: the scan's selected partition count is 1
    val selected = scan match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
      case other => fail(s"expected FileSourceScanExec, got ${other.getClass}")
    }
    assert(selected === 1, s"pruning left $selected directories in the scan")
    // and the data filter must NOT re-read o_month as a data column
    assert(q.count() === Catalog.table(spark, sf0001, "orders")
      .filter(month(col("o_orderdate")) === 3).count())
  }

  test("dynamic partition pruning: join against filtered dim prunes fact partitions at runtime") {
    // dim: month -> quarter; filtered to one quarter (3 of 12 months).
    // The fact side's partition filter can only come from the JOIN — a
    // literal pushdown can't see it — which is exactly what DPP inserts.
    import spark.implicits._
    // the dim must be a SOURCE with a surviving Filter node: an in-memory
    // LocalRelation constant-folds the filter away and the DPP rule no
    // longer sees a selective predicate to reuse
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dim").toString
    (1 to 12).map(m => (m, (m - 1) / 3 + 1)).toDF("d_month", "d_quarter")
      .write.mode("overwrite").parquet(s"$dimPath/months")
    val dim = spark.read.parquet(s"$dimPath/months")
    val fact = spark.read.parquet(factPath)
    val q = fact.join(broadcast(dim.filter(col("d_quarter") === 2)),
        col("o_month") === col("d_month"))
      .agg(count(lit(1)).as("n"))
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"no dynamic pruning subquery in plan:\n${planStr.take(2000)}")
    // correctness: exactly the quarter-2 orders
    val expected = Catalog.table(spark, sf0001, "orders")
      .filter(month(col("o_orderdate")).isin(4, 5, 6)).count()
    assert(q.head.getLong(0) === expected)
  }

  test("x_dpp registry query: its own executed plan carries a dynamicpruning subquery") {
    // the oracle gate proves x_dpp's VALUES; this pins its MECHANISM —
    // the fact scan must be runtime-pruned by the filtered stored dim,
    // not saved by a static rewrite of the tag predicate
    val q = Registry.byName("x_dpp").run(spark, sf0001)
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"x_dpp plan lost dynamic pruning:\n${planStr.take(2000)}")
  }
}
