package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Winnowing summary for the cross-doc sharing statistic, in one pass:
  * `struct<n_fp int, hv array<bigint>>` where
  *
  *   - `n_fp` = `size(winnow_fp(hs, w))` — the count of DISTINCT
  *     winnowing fingerprints (a fingerprint is fully determined by its
  *     rightmost-min global position, so this is the seen-position
  *     count);
  *   - `hv`   = the DISTINCT fingerprint HASH VALUES (ascending) — i.e.
  *     the distinct `split(f, ':')[0]` longs of `winnow_fp(hs, w)`.
  *
  * t_winnow's sharing branch only ever needs the distinct h per doc
  * (`explode → distinct → groupBy(source, h)`); with [[WinnowFp]] that
  * meant building a `"<h>:<pos>"` string per fingerprint, exploding the
  * strings, an interpreted `transform(..., split(f,':')[0])`, and a
  * row-level DISTINCT exchange over (source, doc_id, h-string). This
  * kernel dedups doc-locally and emits 8-byte longs, so the explode
  * feeds the (source, h) partial aggregate directly — no per-fingerprint
  * string is ever built and the distinct shuffle disappears (guide §2.3
  * narrower types / §2.4 remove shuffles, §4 codegen expressions).
  * Value equivalence with the [[WinnowFp]] pipeline is pinned in
  * NgramHvSpec. Fewer than w hashes yields (0, empty); NULL input a
  * NULL struct.
  *
  * Reference anchor: custom-operator extension surface
  * (tests/custom_extension_codec.rs:159-263), registered alongside
  * [[WinnowFp]] / [[NgramHv60]].
  */
case class WinnowHv(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_fp", IntegerType, nullable = false),
    StructField("hv", ArrayType(LongType, containsNull = false),
      nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    // containsNull must be false: compute() reads the hashes as a
    // primitive long array (same rule the r13 advisor asked of winnow_fp)
    case ArrayType(LongType, false) if right.dataType == IntegerType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"winnow_hv requires (array<bigint> containsNull=false, int) " +
        s"arguments, got (${left.dataType.catalogString}, " +
        s"${right.dataType.catalogString})")
  }
  override def prettyName: String = "winnow_hv"

  override protected def nullSafeEval(hs: Any, w: Any): Any =
    WinnowHv.compute(hs.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, w) => s"graft.functions.WinnowHv.compute($h, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowHv =
    copy(left = newLeft, right = newRight)
}

object WinnowHv {

  private def result(nFp: Int, hv: Array[Long]): InternalRow =
    new GenericInternalRow(
      Array[Any](nFp, UnsafeArrayData.fromPrimitiveArray(hv)))

  /** Java-callable entry used by both eval and generated code. Same
    * rightmost-min window scan as [[WinnowFp.compute]]; instead of
    * formatting `"<h>:<pos>"` strings it counts distinct positions and
    * sort-dedups the selected hash values. */
  def compute(hsData: ArrayData, w: Int): InternalRow = {
    val n = hsData.numElements()
    if (w <= 0 || n < w) return result(0, Array.emptyLongArray)
    val hs = hsData.toLongArray()
    val seen = new Array[Boolean](n)
    val sel = new Array[Long](n - w + 1) // ≤ one fingerprint per window
    var nFp = 0
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
        sel(nFp) = mn
        nFp += 1
      }
      j += 1
    }
    // distinct hash values, ascending
    java.util.Arrays.sort(sel, 0, nFp)
    var m = 0
    var i = 0
    while (i < nFp) {
      if (m == 0 || sel(i) != sel(m - 1)) { sel(m) = sel(i); m += 1 }
      i += 1
    }
    result(nFp, java.util.Arrays.copyOf(sel, m))
  }
}
