package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MOSS winnowing fingerprints over a gram-hash array, in one pass:
  * for every sliding window of `w` consecutive hashes, the rightmost
  * minimum, emitted as the legacy `"<minHash>:<globalPos>"` string with
  * first-occurrence dedup — exactly the value, order and format of the
  * interpreted pipeline it replaces in t_winnow:
  *
  *   array_distinct(transform(sequence(0, size(hs) - w), j ->
  *     concat(cast(array_min(slice(hs, j+1, w)) as string), ':',
  *            cast(j + w - array_position(reverse(slice(hs, j+1, w)),
  *                                        array_min(slice(hs, j+1, w)))
  *                 as string))))
  *
  * (`j + w - array_position(reverse(window), min)` is the GLOBAL 0-based
  * index of the window min's last occurrence — so a fingerprint is fully
  * determined by that position, and dedup reduces to a seen-position
  * bitmap.) The legacy chain allocates ~10 objects per window (two
  * slices, a reverse, strings); this emits one small string per DISTINCT
  * fingerprint (~1 per w windows) and nothing else. Pinned ordered-equal
  * to the legacy pipeline in NgramHvSpec. Fewer than w hashes yields an
  * empty array; NULL input a NULL array.
  *
  * Reference anchor: custom-operator extension surface
  * (tests/custom_extension_codec.rs:159-263), registered alongside
  * [[NgramHv60]] / [[ShingleHv60]].
  */
case class WinnowFp(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    // containsNull must be false: compute() reads the hashes as a
    // primitive long array, so a direct-SQL caller passing a nullable
    // array must fail at ANALYSIS, not NPE/garbage at runtime (r13
    // advice). Registry usage (ngram_hv60 output) is containsNull=false.
    case ArrayType(LongType, false) if right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp requires (array<bigint>, int) arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def prettyName: String = "winnow_fp"

  override protected def nullSafeEval(hs: Any, w: Any): Any =
    WinnowFp.compute(hs.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, w) => s"graft.functions.WinnowFp.compute($h, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowFp =
    copy(left = newLeft, right = newRight)
}

object WinnowFp {

  private val emptyArr = new GenericArrayData(new Array[Any](0))

  /** Java-callable entry used by both eval and generated code. */
  def compute(hsData: ArrayData, w: Int): ArrayData = {
    val n = hsData.numElements()
    if (w <= 0 || n < w) return emptyArr
    val hs = hsData.toLongArray()
    val seen = new Array[Boolean](n)
    val out = new java.util.ArrayList[Any](n / w + 4)
    var j = 0
    while (j <= n - w) {
      // rightmost minimum of hs[j .. j+w-1]
      var mn = hs(j)
      var pos = j
      var k = j + 1
      while (k < j + w) {
        if (hs(k) <= mn) { mn = hs(k); pos = k }
        k += 1
      }
      if (!seen(pos)) {
        seen(pos) = true
        out.add(UTF8String.fromString(mn.toString + ":" + pos.toString))
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
