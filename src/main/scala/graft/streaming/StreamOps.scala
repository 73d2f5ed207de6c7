package graft.streaming

import graft.util.Num._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface. The reference is bounded-batch only
  * (reference: src/plan/arrow_flight_read.rs:36-38 — `Boundedness::Bounded`),
  * so this is pure extension: the streaming twins of the batch EventOps,
  * built on watermarks + windowed aggregation + keyed state.
  *
  * Scale notes: state is keyed by user_id (same hash-shuffle keying as the
  * batch path), watermark bounds state size, and both ops emit append-mode
  * results so sinks stay incremental at any volume.
  */
object StreamOps {

  /** One event after timestamp normalization (micros keeps parity with the
    * batch path, which reads the nanos column as BIGINT). */
  case class Ev(user_id: Long, ts_us: Long, event_type: String, value: Double)

  /** A closed session emitted once its gap timeout has passed. */
  case class Session(
      user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, tot_value_fix6: Long)

  /** Open-session accumulator (public: the state encoder's generated code
    * must reach the accessors). */
  case class SessState(
      start_us: Long, last_us: Long, n: Long, totFix6: Long)

  /** Tumbling 1-hour windowed counts/sums with a watermark (default
    * 2 hours) — the streaming twin of EventOps.hourlyStats. Late data
    * beyond the watermark is dropped; results append once windows close.
    * `delay` is parametrized so the late-data replay (s_late_data) can
    * pin the drop semantics with a fixture-derived horizon. */
  def hourlyStats(events: DataFrame): DataFrame = hourlyStats(events, "2 hours")

  def hourlyStats(events: DataFrame, delay: String): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(fix6(col("value"))).as("tot_value_fix6"))
      .select(
        unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n"), col("tot_value_fix6"))

  /** Streaming exact dedup: drop records whose key was already seen
    * within the watermark horizon (state is keyed by the dedup key and
    * expires with the watermark — a training-data ingest can run this
    * continuously at any volume because retained state is bounded by
    * `retention`, not by corpus size). */
  def dedupByKey(events: DataFrame, retention: String): DataFrame =
    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", retention)
      .dropDuplicatesWithinWatermark("event_key")

  /** Stream-stream event-time interval join (the streaming twin of
    * EventOps.intervalJoin): purchases within 30 minutes after a click by
    * the same user. Both sides carry watermarks and the join predicate
    * carries the time band, so Spark can expire join state on both sides
    * — the state bound that makes a continuous 100 TB/day ingest feasible.
    * Inner-join matches emit eagerly (no watermark wait). */
  def clickPurchaseJoin(
      clicks: DataFrame, purchases: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val c = clicks
      .withColumn("c_ts", timestamp_micros(col("ts_us")))
      .withWatermark("c_ts", "1 hour")
      .select(col("user_id"), col("c_ts"))
    val p = purchases
      .withColumn("p_ts", timestamp_micros(col("ts_us")))
      .withWatermark("p_ts", "1 hour")
      .select(col("user_id").as("p_uid"), col("p_ts"), col("value"))
    // leftOuter: an unmatched click emits (nulls on the purchase side) only
    // once the watermark proves no in-band purchase can still arrive — the
    // state-expiry semantics that keep a continuous outer join bounded
    c.join(p, expr(
      "user_id = p_uid AND p_ts >= c_ts AND p_ts < c_ts + interval 30 minutes"),
      joinType)
      .select(col("user_id"), unix_micros(col("c_ts")).as("c_ts_us"),
        unix_micros(col("p_ts")).as("p_ts_us"), col("value"))
  }

  /** One change record for CDC compaction (event_id breaks ts ties). */
  case class Rec(
      user_id: Long, ts_us: Long, event_id: Long,
      event_type: String, value: Double)

  /** Streaming CDC compaction — the continuous twin of the batch
    * e_upsert_compact query: keyed state holds each entity's current
    * latest record; every micro-batch emits the updated state for keys it
    * touched (Update output mode). State is ONE record per live entity —
    * bounded by entity count, not stream length — which is what lets a
    * changelog consumer run forever. Late/out-of-order records are
    * handled by the (ts, id) max, not by arrival order. */
  def latestByKey(recs: Dataset[Rec]): Dataset[Rec] = {
    import recs.sparkSession.implicits._
    recs.groupByKey(_.user_id)
      .mapGroupsWithState[Rec, Rec](GroupStateTimeout.NoTimeout) {
        (_, it, st: GroupState[Rec]) =>
          val best = (it ++ st.getOption.iterator)
            .maxBy(r => (r.ts_us, r.event_id))
          st.update(best)
          best
      }
  }

  /** Gap-based sessionization (the streaming twin of EventOps.sessionize):
    * per-user keyed state via flatMapGroupsWithState, closing a session
    * when `gap` passes without events (event-time timeout).
    *
    * `delay` (the watermark lateness allowance) defaults to the gap but
    * is independently settable: an ingest that tolerates day-late events
    * while sessionizing on a 30-minute gap runs `delay` ≫ `gap` — a late
    * event below the filter watermark is dropped, one above it reaches
    * the state machine and merges into (or reopens after) its user's
    * session. The s_sessionize_late replay pins exactly that split. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int): Dataset[Session] =
    sessionize(events, gapMinutes, s"$gapMinutes minutes")

  def sessionize(events: Dataset[Ev], gapMinutes: Int, delay: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def update(userId: Long, evs: Iterator[Ev], st: GroupState[SessState])
        : Iterator[Session] = {
      if (st.hasTimedOut) {
        val s = st.get
        st.remove()
        return Iterator(Session(userId, s.start_us, s.last_us, s.n, s.totFix6))
      }
      val sorted = evs.toSeq.sortBy(e => (e.ts_us))
      var closed = List.empty[Session]
      var cur = st.getOption
      sorted.foreach { e =>
        val vFix = math.floor(e.value * 1e6 + 0.5).toLong
        cur match {
          case Some(s) if e.ts_us - s.last_us <= gapUs =>
            cur = Some(s.copy(last_us = e.ts_us, n = s.n + 1, totFix6 = s.totFix6 + vFix))
          case Some(s) =>
            closed ::= Session(userId, s.start_us, s.last_us, s.n, s.totFix6)
            cur = Some(SessState(e.ts_us, e.ts_us, 1, vFix))
          case None =>
            cur = Some(SessState(e.ts_us, e.ts_us, 1, vFix))
        }
      }
      cur.foreach { s =>
        st.update(s)
        st.setTimeoutTimestamp((s.last_us + gapUs) / 1000L + 1)
      }
      closed.reverseIterator
    }

    events
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .withWatermark("ts", delay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
