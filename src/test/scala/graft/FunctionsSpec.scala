package graft

import org.apache.spark.sql.functions._

/** Native expression semantics: cosine_sim must bit-match its composable
  * `aggregate(zip_with(...))` form on well-formed input AND on malformed
  * input (mismatched lengths → NULL, not a truncated similarity). */
class FunctionsSpec extends SparkSpec {

  import spark.implicits._

  private val lambdaForm =
    expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
      " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)") /
      (sqrt(expr("aggregate(transform(a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))," +
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")) *
        sqrt(expr("aggregate(transform(b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))," +
          " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")))

  test("cosine_sim bit-matches the lambda form on equal-length arrays") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(0.5f, -0.25f), Array(0.5f, -0.25f))).toDF("a", "b")
    val rows = df.select(expr("cosine_sim(a, b)").as("native"),
      lambdaForm.as("lambda")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("cosine_sim yields NULL on mismatched lengths and null inputs") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Option(Array(1.0f, 2.0f, 3.0f)), Option(Array(1.0f, 2.0f))),
      (Option(Array(1.0f)), None: Option[Array[Float]]))
      .toDF("a", "b")
    val out = df.select(expr("cosine_sim(a, b)")).collect()
    assert(out.forall(_.isNullAt(0)),
      "mismatched/missing embeddings must surface as NULL, not a truncated sim")
    // interpreted path (nullSafeEval) must agree — actually disable
    // whole-stage codegen and force the interpreted expression factory,
    // otherwise this re-tests the same generated code
    val prevWsc = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(expr("cosine_sim(a, b)")).collect()
      assert(interp.forall(_.isNullAt(0)), "interpreted path diverged from codegen")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevWsc)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("corpus-scaled LSH parameters: exact integer boundaries") {
    import graft.queries.VectorOps.{bandBits, semSubBits}
    // bandBits: smallest b ≥ 4 with N ≤ 32·2^b — pure integer search, so
    // Spark and the DuckDB oracle's range-scan formulation agree exactly
    // even where a float log2 would sit on an ulp boundary
    assert(bandBits(1) === 4)
    assert(bandBits(512) === 4)    // 32·2^4 exactly — boundary stays low
    assert(bandBits(513) === 5)
    assert(bandBits(2000) === 6)   // the sf0.1 corpus
    assert(bandBits(10_000_000_000L) === 29) // the 100 TB shape fits BIGINT buckets
    // semSubBits: smallest r ≥ 0 with N ≤ ivfK·50·2^r (ivfK = 10)
    assert(semSubBits(500) === 0)  // gate scale: no sub-split, exact per-cell pairs
    assert(semSubBits(501) === 1)
    assert(semSubBits(2000) === 2) // sf0.1
    assert(semSubBits(20000) === 6)
  }

  // ---------------------------------------------------- damerau_levenshtein

  private def dl(a: String, b: String): Int =
    graft.functions.EditDistance.damerau(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("damerau_levenshtein is the FULL metric, not OSA") {
    // the discriminating pair: OSA forbids edits after a transposition
    // (CA→AC→ABC would be 2 but OSA answers 3); DuckDB's function answers
    // 2 (probed), so the full Lowrance-Wagner metric is what hash-gates
    assert(dl("CA", "ABC") === 2)
    assert(dl("abc", "ca") === 2)
    assert(dl("abcd", "acbd") === 1)   // one adjacent transposition
    assert(dl("kitten", "sitting") === 3)
    assert(dl("", "ab") === 2)
    assert(dl("ab", "") === 2)
    assert(dl("same", "same") === 0)
    assert(dl("a", "a") === 0)
  }

  test("damerau_levenshtein metric properties on random strings") {
    val rnd = new scala.util.Random(42)
    def s() = (0 until rnd.nextInt(8)).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    for (_ <- 0 until 500) {
      val (a, b, c) = (s(), s(), s())
      val ab = dl(a, b)
      assert(ab === dl(b, a), s"symmetry broke on '$a','$b'")
      assert(ab >= math.abs(a.length - b.length) && ab <= math.max(a.length, b.length),
        s"bounds broke on '$a','$b'")
      assert(ab <= dl(a, c) + dl(c, b), s"triangle broke on '$a','$c','$b'")
      assert(ab === 0 === (a == b), s"identity broke on '$a','$b'")
    }
  }

  test("damerau_levenshtein: SQL registration, lev upper bound, codegen≡interpreted") {
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      def s() = (0 until rnd.nextInt(12)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      (s(), s())
    }
    val df = rows.toDF("a", "b")
    val out = df.select(expr("damerau_levenshtein(a, b)").as("dl"),
      levenshtein(col("a"), col("b")).as("lev")).collect()
    out.foreach(r => assert(r.getInt(0) <= r.getInt(1),
      "full DL can never exceed Levenshtein (transpositions only add options)"))
    val prevWsc = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = df.select(expr("damerau_levenshtein(a, b)")).collect()
      assert(out.map(_.getInt(0)).toSeq === interp.map(_.getInt(0)).toSeq,
        "interpreted path diverged from codegen")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevWsc)
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
