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

  /** Bounded per-group top-k by (score DESC, id ASC): the scale path for
    * group-wise top-k. A `row_number().over(partitionBy(g).orderBy(...))`
    * buffers and sorts EVERY row of a group on one reducer before keeping
    * k; this aggregator's state never exceeds k rows per group at any
    * stage — map-side partials keep k, merges keep k — so a billion-row
    * group costs O(n·log k) flat and ships k rows across the shuffle
    * (what TakeOrderedAndProject does for global top-k, provided here
    * per-group). Buffer is sorted by the comparator; merge is a bounded
    * fold — commutative and idempotent on distinct ids, so retries and
    * speculative tasks are safe. Input/output rows are
    * (score, id, payload); `id` MUST uniquely identify a row within the
    * group — it is the deterministic tiebreak, and two rows sharing
    * (score, id) with different payloads would make buffer order
    * insertion-dependent. */
  final case class TopKBy(k: Int)
      extends Aggregator[(Double, Long, Long), Seq[(Double, Long, Long)],
        Seq[(Double, Long, Long)]] {
    private def lt(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2) // score desc, id asc
    override def zero: Seq[(Double, Long, Long)] = Vector.empty
    override def reduce(b: Seq[(Double, Long, Long)], x: (Double, Long, Long))
        : Seq[(Double, Long, Long)] = insert(b, x)
    override def merge(a: Seq[(Double, Long, Long)], b: Seq[(Double, Long, Long)])
        : Seq[(Double, Long, Long)] = b.foldLeft(a)(insert)
    override def finish(b: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = b
    private def insert(b: Seq[(Double, Long, Long)], x: (Double, Long, Long))
        : Seq[(Double, Long, Long)] = {
      val v = b.toIndexedSeq
      if (v.size >= k && !lt(x, v.last)) return b // O(1) reject when full
      var lo = 0; var hi = v.size
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(v(mid), x)) lo = mid + 1 else hi = mid
      }
      if (lo < v.size && v(lo) == x) b // idempotent on exact duplicates
      else {
        val inserted = (v.take(lo) :+ x) ++ v.drop(lo)
        if (inserted.size > k) inserted.take(k) else inserted
      }
    }
    override def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] = bufferEncoder
  }
}
