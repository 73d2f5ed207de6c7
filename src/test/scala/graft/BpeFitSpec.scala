package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r14: bpeFit's 8 greedy merge rounds moved from an unrolled relational
  * loop (~3 scheduled jobs/round) to one single-task mapPartitions. This
  * pins the registry outputs of t_bpe_train and t_bpe_apply IDENTICAL to
  * the legacy relational loop, reproduced here verbatim over the same
  * corpus word count at sf0.001 — pair counting (overlaps included),
  * (pc DESC, p1, p2) winner tie-break, and the leftmost-greedy
  * aggregate() re-segmentation fold. */
class BpeFitSpec extends SparkSpec {

  private val bpeMerges = 8

  private def toks(c: org.apache.spark.sql.Column) = split(c, " ")

  /** The r13 relational fit, verbatim shape: returns (final dict, merges). */
  private def legacyFit(dir: String): (DataFrame, DataFrame) = {
    val d = Catalog.table(spark, dir, "documents")
    val wc = d.select(explode(toks(col("text"))).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    var words = wc.withColumn("syms",
      expr("concat(transform(sequence(1, length(word))," +
        " i -> substring(word, i, 1)), array('_'))"))
      .localCheckpoint()
    val merges = Seq.newBuilder[DataFrame]
    for (step <- 1 to bpeMerges) {
      val pairs = words.select(col("cnt"), explode(expr(
        "zip_with(slice(syms, 1, size(syms) - 1), slice(syms, 2, size(syms) - 1)," +
          " (a, b) -> struct(a AS p1, b AS p2))")).as("p"))
        .groupBy(col("p.p1").as("p1"), col("p.p2").as("p2"))
        .agg(sum(col("cnt")).as("pc"))
      val best = pairs.orderBy(col("pc").desc, col("p1"), col("p2")).limit(1)
      merges += best.select(lit(step).as("step"), col("p1"), col("p2"),
        concat(col("p1"), col("p2")).as("merged"), col("pc"))
      words = words.crossJoin(broadcast(best.select(col("p1"), col("p2"))))
        .select(col("word"), col("cnt"), expr(
          "aggregate(syms, CAST(array() AS array<string>), (acc, s) ->" +
            " IF(size(acc) > 0 AND element_at(acc, -1) = p1 AND s = p2," +
            " concat(slice(acc, 1, size(acc) - 1), array(concat(p1, p2)))," +
            " concat(acc, array(s))))").as("syms"))
      if (step % 2 == 0 && step < bpeMerges) words = words.localCheckpoint()
    }
    (words, merges.result().reduce(_ union _))
  }

  test("t_bpe_train rows identical to the legacy relational merge loop") {
    val now = Registry.byName("t_bpe_train").run(spark, sf0001)
      .collect().map(_.toString).sorted
    val legacy = legacyFit(sf0001)._2.orderBy(col("step"))
      .collect().map(_.toString).sorted
    assert(now.toSeq === legacy.toSeq)
  }

  test("final dict (word -> syms) identical to the legacy loop") {
    def key(df: DataFrame) = df
      .select(col("word"), col("cnt"), col("syms"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[String](2).mkString("|"))).sorted.toSeq
    val nowDict = key(graft.queries.TextOps.bpeFit(spark, sf0001)._1)
    val legacyDict = key(legacyFit(sf0001)._1)
    assert(nowDict.nonEmpty)
    assert(nowDict === legacyDict)
  }
}
