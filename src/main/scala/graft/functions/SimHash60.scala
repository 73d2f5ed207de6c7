package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 60-bit SimHash of a space-delimited document.
  *
  * Bit-identical to the composable pipeline it replaces
  * (`explode(split(text,' ')) → h60(tok) → 60 conditional SUMs per doc`,
  * where h60 = first 15 hex chars of md5 as a 60-bit integer) and to the
  * DuckDB oracle (`('0x' || substr(md5(tok),1,15))::BIGINT` votes) — but
  * with none of that pipeline's allocation: no per-token row, no md5 HEX
  * STRING + substring + conv round-trip (three string allocations per
  * token), no 60-accumulator hash-aggregate state per doc, and no
  * token-explode shuffle at all. The fingerprint becomes a scan-direct
  * per-row projection.
  *
  * Why it exists: the r10/r11 100×-replica reads measured
  * t_simhash_neardup GC-BOUND (83 s of gc against a ~100 s wall, 27% of
  * all task time in collection) with the explode feeding the allocator.
  * This is the allocation-shaping fix the round-10 verdict named:
  * primitive state (one long[60] vote array + one 16-byte digest buffer,
  * both thread-local) over per-token strings.
  *
  * Semantics pinned by SimHashSpec against the legacy pipeline:
  * - split on single space, empty tokens INCLUDED (Spark split keeps
  *   inner and trailing empties at limit -1; DuckDB string_split too);
  *   a byte-level scan for 0x20 is equivalent because in UTF-8 a space
  *   byte never occurs inside a multi-byte sequence.
  * - md5 over the token's UTF-8 bytes (`cast(tok as binary)`).
  * - h = first 60 bits of the digest = big-endian first 8 bytes >>> 4.
  * - per-bit vote +1/-1 per occurrence; bit set iff vote > 0.
  *
  * Reference anchor: the custom-operator extension surface
  * (tests/custom_extension_codec.rs:159-263) — same registration path as
  * [[CosineSim]].
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  // MessageDigest is stateful; the 16-byte output buffer and the vote
  // array are reused per task thread so steady-state per-row garbage is
  // just the token-bytes copy the digest API requires none of (we feed
  // update(bytes, off, len) slices of the document's own byte array).
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val bufLocal: ThreadLocal[Array[Byte]] =
    ThreadLocal.withInitial(() => new Array[Byte](16))
  private val votesLocal: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](60))

  /** Java-callable entry used by both eval and generated code. */
  def compute(text: UTF8String): Long = {
    val bytes = text.getBytes
    val md = md5Local.get()
    val buf = bufLocal.get()
    val votes = votesLocal.get()
    java.util.Arrays.fill(votes, 0)
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        md.digest(buf, 0, 16)
        // first 15 hex chars == top 60 bits of the big-endian digest
        var h = ((buf(0) & 0xffL) << 56) | ((buf(1) & 0xffL) << 48) |
          ((buf(2) & 0xffL) << 40) | ((buf(3) & 0xffL) << 32) |
          ((buf(4) & 0xffL) << 24) | ((buf(5) & 0xffL) << 16) |
          ((buf(6) & 0xffL) << 8) | (buf(7) & 0xffL)
        h = h >>> 4
        var b = 0
        while (b < 60) {
          votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}
