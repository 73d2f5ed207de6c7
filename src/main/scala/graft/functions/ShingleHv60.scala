package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct 60-bit hashes of a document's 3-word shingles, in one pass
  * over the text bytes: `array<bigint>` of
  * `h60(shingle) = ('0x' || substr(md5(shingle),1,15))::BIGINT`.
  *
  * Replaces the composable shingle pipeline
  * `explode(array_distinct(transform(sequence(0, n-3),
  *   i -> array_join(slice(split(text,' '), i+1, 3), ' ')))) → hv(sh)`
  * in the minhash family. That pipeline runs INTERPRETED (higher-order
  * functions skip whole-stage codegen) and the r13 JFR profile of the
  * 100× signature-build stage put essentially all its CPU there:
  * `ArrayTransform.nullSafeEval` + `ArrayJoin.eval` through reflective
  * accessors (`DirectMethodHandle.allocateInstance`,
  * `GeneratedConstructorAccessor.newInstance`), UTF8String slice churn,
  * and the md5 → HEX STRING → substring → conv round-trip
  * (`Hex.encodeHex`, `NumberConverter.char2byte`, `MessageDigest.of`
  * per call) — ~26 µs and dozens of allocations per shingle, 3274 s of
  * the query's 3632 s of task time at the 100× replica.
  *
  * This kernel exploits the shingle identity: tokens are `split(text,
  * ' ')` (single-space split, empties kept), and a 3-token shingle
  * re-joined with ' ' is therefore EXACTLY the contiguous byte slice of
  * the original text from the start of token i to the end of token i+2
  * — so no token array, no slice, no join, no shingle string is ever
  * built. The md5 is fed the document's own byte array
  * (`update(bytes, off, len)`), the first 60 bits of the digest are the
  * hash (same top-60-bits identity [[SimHash60]] pins), and per-doc
  * dedup is sort-unique on a thread-local primitive buffer. Steady-state
  * garbage per ROW: the text-bytes copy and the output array.
  *
  * Engine-portability contract (the property the DuckDB oracles rest
  * on): for every shingle string s, the value emitted here equals
  * DuckDB's `('0x' || substr(md5(s),1,15))::BIGint`. Output ORDER is
  * ascending (sort-unique), unlike array_distinct's first-occurrence
  * order — every consumer is order-insensitive (explode into min/
  * collect_set aggregates).
  *
  * Reference anchor: custom-operator extension surface
  * (tests/custom_extension_codec.rs:159-263), same registration path as
  * [[CosineSim]] / [[SimHash60]].
  */
case class ShingleHv60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hv60 requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "shingle_hv60"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHv60.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHv60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHv60 =
    copy(child = newChild)
}

object ShingleHv60 {

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val digLocal: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))
  // growable per-thread shingle-hash buffer; docs are KB-scale so this
  // stabilizes at a few thousand slots per task thread
  private val hvLocal: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial(() => new Array[Long](256))

  /** Java-callable entry used by both eval and generated code. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val md = md5Local.get()
    val dig = digLocal.get()
    var hv = hvLocal.get()
    var m = 0 // shingle count
    // rolling starts of the previous two tokens: a token ending at e
    // with two predecessors yields the shingle bytes [s2, e)
    var s2 = -1 // start of token j-2
    var s1 = -1 // start of token j-1
    var s0 = 0  // start of current token j
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (s2 >= 0) { // at least 3 tokens seen: hash bytes [s2, i)
          md.reset()
          md.update(bytes, s2, i - s2)
          md.digest(dig, 0, 16)
          val h = (((dig(0) & 0xffL) << 56) | ((dig(1) & 0xffL) << 48) |
            ((dig(2) & 0xffL) << 40) | ((dig(3) & 0xffL) << 32) |
            ((dig(4) & 0xffL) << 24) | ((dig(5) & 0xffL) << 16) |
            ((dig(6) & 0xffL) << 8) | (dig(7) & 0xffL)) >>> 4
          if (m == hv.length) {
            hv = java.util.Arrays.copyOf(hv, hv.length * 2)
            hvLocal.set(hv)
          }
          hv(m) = h
          m += 1
        }
        s2 = s1; s1 = s0; s0 = i + 1
      }
      i += 1
    }
    if (m == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // sort-unique: duplicates are adjacent after the primitive sort
    java.util.Arrays.sort(hv, 0, m)
    var u = 1
    var k = 1
    while (k < m) {
      if (hv(k) != hv(u - 1)) { hv(u) = hv(k); u += 1 }
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hv, u))
  }
}
