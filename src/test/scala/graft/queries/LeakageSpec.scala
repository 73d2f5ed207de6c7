package graft.queries

import graft.{Catalog, Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** p_split_leakfree's contract: the group-aware split keeps every
  * near-dup cluster inside ONE of train/val/test, while the naive
  * per-doc hash split (p_split's assignment) demonstrably leaks —
  * without the leak being demonstrated on the same fixture the
  * "leakage-free" claim would be vacuous (any split is leak-free on a
  * corpus with no near-dups). */
class LeakageSpec extends SparkSpec {

  test("group-aware split has zero spanning clusters; naive split leaks") {
    val d = Catalog.table(spark, sf0001, "documents")
    val cl = GraphOps.ccLabels(TextOps.minhashPairs(
        TextOps.spread(d).select(col("doc_id"), col("text")), 0.5))
      .withColumnRenamed("id", "doc_id")

    val multi = cl.groupBy(col("lbl")).count().filter(col("count") > 1).count()
    assert(multi > 0, "fixture has no multi-member near-dup clusters — " +
      "the leakage property would be vacuously true")

    def splitOf(key: org.apache.spark.sql.Column, tag: String) = {
      val b = TextOps.h60(concat(lit(tag), key.cast("string"))) % 100
      when(b < 80, "train").when(b < 90, "val").otherwise("test")
    }
    // naive: hash the DOC (p_split's rule) — clusters span splits
    val naiveLeaks = cl
      .select(col("lbl"), splitOf(col("doc_id"), "split:").as("split"))
      .groupBy(col("lbl")).agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(naiveLeaks > 0,
      "expected the per-doc hash split to place some near-dup cluster " +
        "across splits on this fixture (the bug the group split fixes)")
    // group-aware: hash the CLUSTER (p_split_leakfree's rule) — never
    val groupLeaks = d.join(cl, Seq("doc_id"), "left")
      .select(coalesce(col("lbl"), col("doc_id")).as("grp"))
      .select(col("grp"), splitOf(col("grp"), "gsplit:").as("split"))
      .groupBy(col("grp")).agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(groupLeaks === 0L)
  }

  test("p_split_leakfree audit accounts for every document exactly once") {
    val out = Registry.byName("p_split_leakfree").run(spark, sf0001).collect()
    assert(out.map(_.getAs[String]("split")).toSeq.sorted ===
      Seq("test", "train", "val"))
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total ===
      Catalog.table(spark, sf0001, "documents").count())
  }
}
