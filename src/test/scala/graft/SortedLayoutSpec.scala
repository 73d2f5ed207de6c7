package graft

import org.apache.spark.sql.functions._

/** Sort-order introspection for [[Catalog.writeRangeSorted]] — the
  * reference's declared file sort order (reference:
  * benchmarks/src/tpch/run.rs:334-339 `file_sort_order`) must be TRUE of
  * the written files, not just declared: (a) per-file key spans are
  * pairwise disjoint (`repartitionByRange` keeps equal keys together),
  * (b) rows inside each file are non-decreasing on the key (so every
  * parquet row group carries tight min/max stats), and (c) a range
  * predicate reaches the scan as PushedFilters so those stats actually
  * prune row groups at read time. The x_range_sorted registry query
  * gates the read path's values; this suite gates the layout property
  * that makes it cheap.
  */
class SortedLayoutSpec extends SparkSpec {

  private lazy val root = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rsort").toString
    Catalog.writeRangeSorted(
      Catalog.table(spark, sf0001, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate")),
      s"$dir/orders_rs", 8, col("o_orderdate"))
    s"$dir/orders_rs"
  }

  // the fixture's o_orderdate is parquet timestamp_ntz -> LocalDateTime rows
  private def fileSpans: Array[(String, java.time.LocalDateTime, java.time.LocalDateTime)] =
    spark.read.parquet(root)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("o_orderdate")).as("lo"), max(col("o_orderdate")).as("hi"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        r.getAs[java.time.LocalDateTime](2)))
      .sortBy(_._2)(Ordering.fromLessThan(_ isBefore _))

  test("range-sorted layout: per-file key spans are pairwise disjoint") {
    val spans = fileSpans
    assert(spans.length >= 4, s"expected several files, got ${spans.length}")
    spans.sliding(2).foreach {
      case Array((fa, _, hiA), (fb, loB, _)) =>
        assert(hiA.isBefore(loB),
          s"file spans overlap: $fa ends $hiA, $fb starts $loB — " +
            "range partitioning must keep key ranges disjoint")
      case _ => ()
    }
  }

  test("in-file order: rows are non-decreasing on the sort key in every file") {
    fileSpans.foreach { case (f, _, _) =>
      val dates = spark.read.parquet(f).select(col("o_orderdate"))
        .collect().map(_.getAs[java.time.LocalDateTime](0))
      assert(dates.sameElements(dates.sortBy(identity)(
        Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _))),
        s"rows in $f are not sorted on o_orderdate")
    }
  }

  test("range predicate reaches the parquet scan as pushed filters") {
    val q = spark.read.parquet(root)
      .filter(col("o_orderdate").between(lit("1997-01-01"), lit("1997-03-31")))
    // read the scan's metadata map, not its toString — plan rendering
    // truncates the PushedFilters list at ~100 chars
    val pushed = q.queryExecution.executedPlan.collectLeaves().head match {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metadata("PushedFilters")
      case other => fail(s"expected FileSourceScanExec, got ${other.getClass}")
    }
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate") &&
      pushed.contains("LessThanOrEqual(o_orderdate"),
      s"range bounds not pushed to the scan: $pushed")
    // values survive the layout round-trip
    val expect = Catalog.table(spark, sf0001, "orders")
      .filter(col("o_orderdate").between(lit("1997-01-01"), lit("1997-03-31")))
      .count()
    assert(q.count() === expect)
  }
}
