package graft

import graft.errors.{DataError, ExecutionError, GraftError, PlanningError}
import org.apache.spark.sql.functions._

/** Error-taxonomy specs (≡ the reference's error_propagation test:
  * the root failure message must survive the executor->driver boundary,
  * reference: tests/error_propagation.rs:48-66). */
class ErrorSpec extends SparkSpec {

  import spark.implicits._

  test("missing column classifies as PlanningError") {
    val e = intercept[GraftError] {
      GraftError.wrap(Catalog.table(spark, sf0001, "lineitem")
        .select(col("no_such_column")).collect())
    }
    assert(e.isInstanceOf[PlanningError])
    assert(e.getMessage.contains("no_such_column"))
  }

  test("executor-side arithmetic failure surfaces as ExecutionError with root message") {
    val e = intercept[GraftError] {
      GraftError.wrap(
        spark.range(0, 10, 1, 4).select((lit(1) / col("id")).as("x"))
          .agg(sum($"x")).collect())
    }
    assert(e.isInstanceOf[ExecutionError], s"got ${e.kind}: ${e.getMessage}")
    assert(e.getMessage.toLowerCase.contains("divide"), e.getMessage)
  }

  test("executor-side custom exception preserves its exact message") {
    val boom = udf((i: Long) => {
      if (i == 7) throw new IllegalStateException("graft-test-boom-7")
      i
    })
    val e = intercept[GraftError] {
      GraftError.wrap(spark.range(0, 16, 1, 8).select(boom(col("id"))).collect())
    }
    assert(e.getMessage.contains("graft-test-boom-7"),
      s"root message lost: ${e.getMessage}")
  }

  test("unreadable path classifies as planning/data error, not internal") {
    val e = intercept[GraftError] {
      GraftError.wrap(spark.read.parquet("/no/such/dir").collect())
    }
    assert(e.isInstanceOf[PlanningError] || e.isInstanceOf[DataError])
  }
}
