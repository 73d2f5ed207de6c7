package graft

import org.apache.spark.sql.functions._

/** r14: [[graft.functions.TokenCounts]] equivalence pins against the
  * legacy composable expressions it replaces in the BM25 family:
  *
  *   - `tc[0]`  == `size(split(text, ' '))` (empties kept, limit -1)
  *   - `tc[i+1]`== the exploded-token per-term COUNT
  *   - `Σ tc[i+1]` == `size(filter(split(text,' '), x -> x='a' or ...))`
  *   - NULL text → NULL array (same as size(split(NULL)) → NULL)
  */
class TokenCountsSpec extends SparkSpec {

  import spark.implicits._

  private val terms = Seq("spark", "join", "window")
  private val csv = terms.mkString(",")

  private val cases = Seq(
    "spark join window",
    "spark spark spark",
    "",                       // one empty segment
    " ",                      // two empty segments
    "  spark  ",              // leading/trailing/consecutive spaces
    "spark",
    "nomatch tokens only here",
    "join x join y join",
    "sparkjoin window windowspark win dow",
    "münchen spark grüße join ßß window",   // multi-byte UTF-8 neighbors
    "spark  join", // empty segment between matches
    (1 to 50).map(i => if (i % 7 == 0) "window" else s"t$i").mkString(" "))

  test("tc[0] == size(split(text,' ')) and per-term counts match explode+groupBy") {
    graft.functions.GraftFunctions.register(spark)
    val df = cases.toDF("text")
    val legacyTf = df.select(col("text"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isInCollection(terms))
      .groupBy(col("text"), col("tok")).agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val rows = df.select(col("text"),
      expr(s"token_counts(text, '$csv')").as("tc"),
      size(split(col("text"), " ")).as("dl")).collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val tc = r.getSeq[Long](1)
      assert(tc.head === r.getInt(2).toLong, s"dl mismatch for '$text'")
      terms.zipWithIndex.foreach { case (t, i) =>
        assert(tc(i + 1) === legacyTf.getOrElse((text, t), 0L),
          s"tf($t) mismatch for '$text'")
      }
    }
  }

  test("sum of per-term counts == size(filter(tk, matches-any))") {
    graft.functions.GraftFunctions.register(spark)
    val pred = terms.map(t => s"x = '$t'").mkString(" or ")
    val rows = cases.toDF("text").select(
      expr(s"token_counts(text, '$csv')").as("tc"),
      expr(s"size(filter(split(text, ' '), x -> $pred))").as("c")).collect()
    rows.foreach { r =>
      val tc = r.getSeq[Long](0)
      assert(tc.drop(1).sum === r.getInt(1).toLong)
    }
  }

  test("NULL text yields NULL, matching size(split(NULL)) semantics") {
    graft.functions.GraftFunctions.register(spark)
    val r = Seq(Tuple1[String](null)).toDF("text")
      .select(expr(s"token_counts(text, '$csv')").as("tc"),
        size(split(col("text"), " ")).as("dl")).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("non-foldable terms argument is rejected at analysis time") {
    graft.functions.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq(("a", "b")).toDF("text", "t")
        .select(expr("token_counts(text, t)")).collect()
    }
    assert(e.getMessage.contains("token_counts"))
  }
}
