package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token statistics for a fixed query-term set, in one pass
  * over the text bytes: `token_counts(text, 'a,b,c')` returns
  * `array<bigint>` `[dl, tf_a, tf_b, tf_c]` where
  *
  *   - `dl`   = `size(split(text, ' '))` — the single-space segment
  *     count, EMPTY SEGMENTS INCLUDED (Spark's split keeps leading/
  *     trailing/consecutive-space empties: limit = -1), i.e. the number
  *     of ' ' bytes plus one;
  *   - `tf_i` = the number of segments byte-equal to the i-th
  *     comma-separated term — so `Σ tf_i` equals
  *     `size(filter(split(text,' '), x -> x='a' or x='b' or x='c'))`
  *     for distinct terms, and each `tf_i` equals the per-term COUNT of
  *     the exploded-token groupBy it replaces.
  *
  * Replaces two interpreted/shuffle-heavy shapes in the BM25 family
  * (r14): the `explode(tk) → filter(isInCollection) →
  * groupBy(doc_id, dl, tok)` term-frequency build (a full shuffle of
  * every matching token occurrence) and the relevance-label scan's
  * interpreted `size(filter(tk, x -> ...))` higher-order function
  * (HOFs skip whole-stage codegen). With per-doc counts available in
  * the scan projection, term frequencies, document frequencies, corpus
  * stats and per-doc BM25 scores are all computable without any wide
  * exchange (guide §2.3/§2.4 decide-with-small-rows, §4 codegen
  * expressions).
  *
  * The term-set argument must be a foldable string; terms are ASCII
  * tokens without spaces or commas (the BM25 query terms). Byte-wise
  * segment comparison is exact for any UTF-8 text because 0x20 never
  * occurs inside a multi-byte sequence. NULL text yields NULL (same as
  * `size(split(NULL, ' '))` under Spark 3+ `sizeOfNull=false`
  * semantics).
  *
  * Reference anchor: custom-operator extension surface
  * (tests/custom_extension_codec.rs:159-263), registered alongside
  * [[ShingleHv60]] / [[WinnowHv]].
  */
case class TokenCounts(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType &&
        right.foldable) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "token_counts requires (string, foldable string) arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString}" +
        (if (right.foldable) ")" else ", non-foldable)"))
  override def prettyName: String = "token_counts"

  override protected def nullSafeEval(text: Any, terms: Any): Any =
    TokenCounts.compute(text.asInstanceOf[UTF8String],
      terms.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.functions.TokenCounts.compute($t, $s)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenCounts =
    copy(left = newLeft, right = newRight)
}

object TokenCounts {

  /** Parsed term list, cached per thread. The terms argument is a
    * foldable literal, so in generated code the SAME UTF8String instance
    * arrives every row — the `eq` fast path hits after the first row;
    * `equals` covers fresh instances (interpreted eval, retries). */
  private val termCache =
    new ThreadLocal[(UTF8String, Array[Array[Byte]])]()

  private def termsOf(csv: UTF8String): Array[Array[Byte]] = {
    val cached = termCache.get()
    if (cached != null && ((cached._1 eq csv) || cached._1.equals(csv)))
      return cached._2
    val parsed = csv.toString.split(",").map(
      _.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    termCache.set((csv, parsed))
    parsed
  }

  /** Java-callable entry used by both eval and generated code. */
  def compute(text: UTF8String, termsCsv: UTF8String): ArrayData = {
    val terms = termsOf(termsCsv)
    val b = text.getBytes
    val counts = new Array[Long](terms.length + 1)
    var dl = 0L
    var segStart = 0
    var i = 0
    val n = b.length
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        dl += 1L
        val segLen = i - segStart
        var t = 0
        while (t < terms.length) {
          val tb = terms(t)
          if (tb.length == segLen) {
            var k = 0
            while (k < segLen && tb(k) == b(segStart + k)) k += 1
            if (k == segLen) counts(t + 1) += 1L
          }
          t += 1
        }
        segStart = i + 1
      }
      i += 1
    }
    counts(0) = dl
    UnsafeArrayData.fromPrimitiveArray(counts)
  }
}
