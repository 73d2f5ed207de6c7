package graft

import graft.errors._
import org.apache.spark.sql.functions._

/** Error-taxonomy specs (≡ the reference's error_propagation test:
  * the root failure message must survive the executor->driver boundary,
  * reference: tests/error_propagation.rs:48-66; typed-variant parity
  * target: src/errors/datafusion_error.rs:21-61 + the six per-domain
  * sub-codec files). Every leaf class is asserted from a REAL failing
  * query — never constructed directly. */
class ErrorSpec extends SparkSpec {

  import spark.implicits._

  // ----------------------------------------------------------- planning
  test("missing column classifies as PlanningError/AnalysisError") {
    val e = intercept[GraftError] {
      GraftError.wrap(Catalog.table(spark, sf0001, "lineitem")
        .select(col("no_such_column")).collect())
    }
    assert(e.isInstanceOf[PlanningError])
    assert(e.isInstanceOf[AnalysisError], s"kind=${e.kind}")
    assert(e.kind === "planning.analysis")
    assert(e.getMessage.contains("no_such_column"))
  }

  test("malformed SQL classifies as ParseError") {
    val e = intercept[GraftError] {
      GraftError.wrap(spark.sql("SELEC 1 FORM nowhere").collect())
    }
    assert(e.isInstanceOf[ParseError], s"kind=${e.kind}: ${e.getMessage}")
    assert(e.kind === "planning.parse")
  }

  // --------------------------------------------------------------- data
  test("unreadable path classifies as IoError (data family)") {
    val e = intercept[GraftError] {
      GraftError.wrap(spark.read.parquet("/no/such/dir").collect())
    }
    assert(e.isInstanceOf[DataError], s"kind=${e.kind}: ${e.getMessage}")
    assert(e.isInstanceOf[IoError], s"kind=${e.kind}")
  }

  test("file vanished after planning classifies as IoError with root message") {
    val dir = java.nio.file.Files.createTempDirectory("graft-err-io").toFile
    try {
      spark.range(100).write.mode("overwrite").parquet(dir + "/t")
      val df = spark.read.parquet(dir + "/t") // plan + file index built
      df.count()
      new java.io.File(dir, "t").listFiles().foreach(_.delete())
      // a second read through the SAME cached file index now 404s at scan
      val e = intercept[GraftError] {
        GraftError.wrap(df.withColumn("x", col("id") + 1).collect())
      }
      assert(e.isInstanceOf[IoError], s"kind=${e.kind}: ${e.getMessage}")
      assert(e.kind === "data.io")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("corrupt parquet bytes classify as ParquetCorruptionError") {
    val dir = java.nio.file.Files.createTempDirectory("graft-err-pq").toFile
    try {
      val f = new java.io.File(dir, "bad.parquet")
      java.nio.file.Files.write(f.toPath,
        "these bytes are not parquet at all".getBytes)
      val e = intercept[GraftError] {
        GraftError.wrap(spark.read.parquet(f.getAbsolutePath).collect())
      }
      assert(e.isInstanceOf[ParquetCorruptionError],
        s"kind=${e.kind}: ${e.getMessage}")
      assert(e.kind === "data.parquet")
    } finally {
      Option(dir.listFiles()).foreach(_.foreach(_.delete())); dir.delete()
    }
  }

  test("requested schema conflicting with file types classifies as SchemaMismatchError") {
    val dir = java.nio.file.Files.createTempDirectory("graft-err-sch").toFile
    try {
      spark.range(100).select(col("id").cast("double").as("v"))
        .write.mode("overwrite").parquet(dir + "/t")
      val e = intercept[GraftError] {
        GraftError.wrap(
          spark.read.schema("v INT").parquet(dir + "/t").collect())
      }
      assert(e.isInstanceOf[SchemaMismatchError],
        s"kind=${e.kind}: ${e.getMessage}")
      assert(e.kind === "data.schema")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  // ---------------------------------------------------------- execution
  test("executor-side divide-by-zero classifies as ArithmeticError") {
    val e = intercept[GraftError] {
      GraftError.wrap(
        spark.range(0, 10, 1, 4).select((lit(1) / col("id")).as("x"))
          .agg(sum($"x")).collect())
    }
    assert(e.isInstanceOf[ArithmeticError], s"kind=${e.kind}: ${e.getMessage}")
    assert(e.kind === "execution.arithmetic")
    assert(e.getMessage.toLowerCase.contains("divide"), e.getMessage)
  }

  test("ANSI long overflow classifies as OverflowError") {
    val e = intercept[GraftError] {
      GraftError.wrap(
        spark.range(1, 3, 1, 2)
          .select((lit(Long.MaxValue) + col("id")).as("x")).collect())
    }
    assert(e.isInstanceOf[OverflowError], s"kind=${e.kind}: ${e.getMessage}")
    assert(e.kind === "execution.overflow")
  }

  test("ANSI invalid cast classifies as CastError") {
    val e = intercept[GraftError] {
      GraftError.wrap(
        Seq("12", "abc").toDF("s").repartition(2)
          .select(col("s").cast("int").as("i")).collect())
    }
    assert(e.isInstanceOf[CastError], s"kind=${e.kind}: ${e.getMessage}")
    assert(e.kind === "execution.cast")
  }

  test("ANSI out-of-bounds element_at classifies as InvalidIndexError") {
    val e = intercept[GraftError] {
      GraftError.wrap(
        spark.range(0, 4, 1, 2)
          .select(element_at(array(lit(1), lit(2)), 5).as("x")).collect())
    }
    assert(e.isInstanceOf[InvalidIndexError], s"kind=${e.kind}: ${e.getMessage}")
    assert(e.kind === "execution.index")
  }

  test("executor-side custom exception classifies as UserCodeError, exact message kept") {
    val boom = udf((i: Long) => {
      if (i == 7) throw new IllegalStateException("graft-test-boom-7")
      i
    })
    val e = intercept[GraftError] {
      GraftError.wrap(spark.range(0, 16, 1, 8).select(boom(col("id"))).collect())
    }
    assert(e.isInstanceOf[UserCodeError], s"kind=${e.kind}: ${e.getMessage}")
    assert(e.kind === "execution.user")
    assert(e.getMessage.contains("graft-test-boom-7"),
      s"root message lost: ${e.getMessage}")
  }

  test("nested context chain survives the executor boundary") {
    // ≡ the reference's nested Context wrappers
    // (src/errors/datafusion_error.rs:21-61): the user gets the full
    // causal chain — enclosing scope labels outermost first, then the
    // Spark wrapper frames the task failure crossed — not just root
    // message + top cause
    // a task-side custom exception is guaranteed to arrive WRAPPED
    // (SparkException job-abort layers), unlike ANSI faults which Spark 4
    // rethrows unwrapped — so this shape exercises both context sources
    val boom = udf((i: Long) => {
      if (i == 7) throw new IllegalStateException("graft-ctx-boom-7")
      i
    })
    val e = intercept[GraftError] {
      GraftError.context("query: q_fail_demo") {
        GraftError.context("operator: projection") {
          spark.range(0, 16, 1, 8).select(boom(col("id"))).collect()
        }
      }
    }
    assert(e.isInstanceOf[UserCodeError], s"kind=${e.kind}")
    val cs = e.contexts
    val qi = cs.indexOf("query: q_fail_demo")
    val oi = cs.indexOf("operator: projection")
    assert(qi >= 0 && oi >= 0, s"labels missing from chain: $cs")
    assert(qi < oi, s"outermost label must come first: $cs")
    // the executor->driver wrapper frames sit below the labels
    assert(cs.drop(oi + 1).exists(_.startsWith("SparkException")),
      s"no executor wrapper frame in chain: $cs")
    // classification and root message are unchanged by the chain
    assert(e.kind === "execution.user")
    assert(e.getMessage.contains("graft-ctx-boom-7"))
  }

  // --------------------------------------------------------------- conf
  test("invalid session conf value classifies as ConfigError") {
    val e = intercept[GraftError] {
      GraftError.wrap(
        spark.conf.set("spark.sql.shuffle.partitions", "zero"))
    }
    assert(e.isInstanceOf[ConfigError], s"kind=${e.kind}: ${e.getMessage}")
    assert(e.kind === "config")
  }

  // ----------------------------------------------------------- families
  test("leaf kinds are distinct and families still catch coarsely") {
    // ≥8 distinct typed classes, each proven above from a real failure;
    // this pin keeps the wire strings stable for programmatic handlers
    val kinds = Seq("planning.parse", "planning.analysis", "data.schema",
      "data.parquet", "data.io", "execution.arithmetic",
      "execution.overflow", "execution.cast", "execution.index",
      "execution.user", "config")
    assert(kinds.distinct.size === kinds.size)
  }
}
