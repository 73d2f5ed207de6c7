package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (≡ the reference's reserved UDAF registration hook,
  * reference: src/flight_service/session_builder.rs:10-13 and the UDAF
  * codec slots in src/composed_extension_codec.rs:75-97). Spark's
  * `Aggregator[IN, BUF, OUT]` gives merge-based distributed aggregation —
  * the buffer must form a commutative monoid so partial aggregation
  * (map-side combine) stays correct at any partition count.
  */
object Aggregators {

  /** Exact scaled-integer sum (the [[graft.util.Num.fix6]] scheme as a
    * reusable typed aggregator): buffer is a single Long — associative,
    * commutative, overflow-safe to ~9e12 input magnitude. */
  object Fix6Sum extends Aggregator[Double, Long, Double] {
    override def zero: Long = 0L
    override def reduce(b: Long, x: Double): Long =
      b + math.floor(x * 1e6 + 0.5).toLong
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(b: Long): Double = b / 1e6
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Streaming-friendly reservoir-free "k smallest hashes" sketch (the
    * minhash building block as a UDAF): buffer is the sorted ascending
    * array of at most k distinct values; merge is a bounded merge —
    * commutative and idempotent, so retries/speculative tasks are safe. */
  final case class KMin(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty
    override def reduce(b: Seq[Long], x: Long): Seq[Long] = insert(b, x)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(insert)
    override def finish(b: Seq[Long]): Seq[Long] = b
    /** Bounded binary insert: O(log k) search + O(k) splice, and an O(1)
      * reject of any x ≥ max once the buffer is full — the common case in
      * a long stream, where a full re-sort per element would be O(k²·n). */
    private def insert(b: Seq[Long], x: Long): Seq[Long] = {
      val v = b.toIndexedSeq
      if (v.size >= k && x >= v.last) return b
      var lo = 0; var hi = v.size
      while (lo < hi) { // lower-bound binary search on the sorted buffer
        val mid = (lo + hi) >>> 1
        if (v(mid) < x) lo = mid + 1 else hi = mid
      }
      if (lo < v.size && v(lo) == x) b // distinct values only
      else {
        val inserted = (v.take(lo) :+ x) ++ v.drop(lo)
        if (inserted.size > k) inserted.take(k) else inserted
      }
    }
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }
}
