package graft

import graft.plans.Int64List
import org.apache.spark.sql.functions._

/** Custom whole-operator extension spec (≡ the reference's
  * custom_extension_codec test: the user operator must execute and
  * compose with engine-native operators end-to-end). */
class Int64ListSpec extends SparkSpec {

  import spark.implicits._

  test("custom Int64ListExec executes through the planner") {
    val out = Int64List.df(spark, Seq(3L, 1L, 2L), numSlices = 2)
      .orderBy($"value").as[Long].collect()
    assert(out.toSeq === Seq(1L, 2L, 3L))
  }

  test("custom operator composes with joins/aggregates over real tables") {
    val keys = Int64List.df(spark, Seq(1L, 2L, 3L, 4L, 5L))
    val joined = Catalog.table(spark, sf0001, "orders")
      .join(keys, col("o_orderkey") === col("value"), "left_semi")
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("s"))
      .head
    assert(joined.getLong(0) === 5L)
    assert(joined.getLong(1) === 15L)
  }

  test("custom operator appears in the physical plan") {
    val df = Int64List.df(spark, Seq(7L, 8L))
    assert(df.queryExecution.executedPlan.toString.contains("Int64ListExec"))
  }
}
