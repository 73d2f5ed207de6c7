package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Ordered 60-bit hashes of a document's sliding n-word-grams, in one
  * pass over the text bytes: `array<bigint>` whose j-th element (0-based)
  * is `h60(gram starting at token j)` with
  * `h60(s) = ('0x' || substr(md5(s),1,15))::BIGINT` — the positional
  * sibling of [[ShingleHv60]] (which emits the DISTINCT sorted set for a
  * fixed n=3). Fewer than n tokens yields an empty array; NULL text a
  * NULL array.
  *
  * Replaces the interpreted higher-order-function gram pipelines
  * `transform(sequence(...), i -> array_join(slice(split(text,' '), i, n), ' '))`
  * (+ per-gram md5 → hex string → conv) in the n-gram audit family —
  * t_substr_runs (n=8, positional), t_dup_ngrams (n=8, counting phase),
  * t_contamination (n=5), t_winnow (n=3, ordered array form). Those
  * pipelines run interpreted (HOFs skip whole-stage codegen) and pay
  * ~26 µs + dozens of allocations per gram — the same JFR-profiled
  * pathology the minhash family's [[ShingleHv60]] removed.
  *
  * Same byte-slice identity as [[ShingleHv60]]: tokens are
  * `split(text, ' ')` (single-space split, empties kept), so an n-token
  * gram re-joined with ' ' is exactly the contiguous byte slice of the
  * original text from the start of token j to the end of token j+n-1 —
  * no token array, no slice, no join, no gram string is ever built.
  * UTF-8 safe: continuation bytes never equal 0x20. Engine-portability
  * contract (what the DuckDB oracles rest on): for every gram string s,
  * the emitted value equals DuckDB's
  * `('0x' || substr(md5(s),1,15))::BIGINT`. Output ORDER is positional
  * (token index), matching the legacy `transform` element order — pinned
  * against the legacy pipeline in NgramHvSpec.
  *
  * Reference anchor: custom-operator extension surface
  * (tests/custom_extension_codec.rs:159-263), same registration path as
  * [[CosineSim]] / [[SimHash60]] / [[ShingleHv60]].
  */
case class NgramHv60(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_hv60 requires (string, int) arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def prettyName: String = "ngram_hv60"

  override protected def nullSafeEval(text: Any, n: Any): Any =
    NgramHv60.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, n) => s"graft.functions.NgramHv60.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NgramHv60 =
    copy(left = newLeft, right = newRight)
}

object NgramHv60 {

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val digLocal: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))
  // growable per-thread gram-hash buffer; docs are KB-scale so this
  // stabilizes at a few thousand slots per task thread
  private val hvLocal: ThreadLocal[Array[Long]] =
    ThreadLocal.withInitial(() => new Array[Long](256))
  // rolling token-start ring; widest caller uses n=8, grows on demand
  private val ringLocal: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](16))

  /** Java-callable entry used by both eval and generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    if (n <= 0)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val bytes = text.getBytes
    val len = bytes.length
    val md = md5Local.get()
    val dig = digLocal.get()
    var hv = hvLocal.get()
    var ring = ringLocal.get()
    if (ring.length < n) { ring = new Array[Int](n); ringLocal.set(ring) }
    var m = 0   // grams emitted
    var tok = 0 // tokens completed so far (0-based index of current)
    var s0 = 0  // start of current token
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == ' ') {
        ring(tok % n) = s0
        if (tok >= n - 1) { // window of the last n tokens ends here
          val ws = ring((tok - (n - 1)) % n)
          md.reset()
          md.update(bytes, ws, i - ws)
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
        tok += 1; s0 = i + 1
      }
      i += 1
    }
    val out =
      if (m == 0) UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
      else UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hv, m))
    // cap the retained per-thread buffer: one pathological multi-million-
    // token doc would otherwise pin ~8 B/gram per task thread for the
    // JVM's lifetime (r13 advice) — keep KB-scale growth, drop MB-scale
    if (hv.length > MaxRetainedSlots) hvLocal.remove()
    out
  }

  /** Retained-buffer cap (slots): 1 M tokens ≈ 8 MB — anything past this
    * is a one-off giant document, not the steady state. */
  private val MaxRetainedSlots = 1 << 20
}
