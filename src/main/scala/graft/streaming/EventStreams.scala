package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the event stream. The reference has
  * no streaming (SURVEY.md §2.10) — this module is the additive scale path:
  * the SAME aggregations the batch battery oracle-checks (q80/q81) run here
  * incrementally with watermarks and state. Batch/stream parity is
  * guaranteed by construction: the transforms are plain DataFrame code that
  * works on both batch and streaming frames.
  *
  * Input schema: (ts: Timestamp, user_id: Long, event_type: String,
  * value: Double).
  */
object EventStreams {

  /** Tumbling-window aggregation with a watermark: late events beyond
    * `lateness` are dropped, state is bounded — the 100 TB streaming
    * posture (state size ∝ open windows × keys, not history).
    */
  def windowedCounts(
      events: DataFrame, window_ : String = "1 day",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization via the built-in session_window — Spark
    * merges overlapping windows per key in state; the declarative form of
    * q81's batch lag/cumsum (SURVEY.md §2.10 scale path).
    */
  def sessionWindows(
      events: DataFrame, gap: String = "30 minutes",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Ingest dedup at the edge: at-least-once sources re-deliver events;
    * keep first-seen per event_id with state BOUNDED by the watermark
    * (`dropDuplicatesWithinWatermark` — a plain streaming
    * `dropDuplicates` keeps every key seen forever, the 100 TB state
    * killer). The batch analogue with an oracle is q82. */
  def dedupedEvents(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream ATTRIBUTION join: each purchase joins the same user's
    * clicks inside the preceding `windowDur` interval — the canonical
    * watermarked interval join. Both sides carry watermarks and the join
    * condition bounds event time on BOTH ends, so Spark can expire join
    * state (state ∝ users active inside watermark + interval, never the
    * stream history — the 100 TB posture; an unbounded-time stream-stream
    * join would buffer forever). Batch twin with the DuckDB oracle: q83.
    */
  def attributionJoin(
      clicks: DataFrame, purchases: DataFrame,
      windowDur: String = "30 minutes", lateness: String = "1 hour"): DataFrame = {
    val c = clicks.withWatermark("ts", lateness)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val p = purchases.withWatermark("ts", lateness)
    p.join(c,
      col("c_user") === col("user_id") &&
        col("c_ts") >= col("ts") - expr(s"INTERVAL $windowDur") &&
        col("c_ts") < col("ts"))
  }

  final case class Delivered(
    event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  final case class Event(ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class SessionState(start: Long, lastMs: Long, n: Int)
  final case class SessionOut(user_id: Long, startMs: Long, endMs: Long, n_events: Int)

  final case class AsofState(ms: Long, eventId: Long, value: Double)
  final case class AsofOut(
    user_id: Long, ts_ms: Long, asof_ts_ms: Option[Long],
    asof_value: Option[Double])

  /** Streaming AS-OF enrichment via flatMapGroupsWithState — the
    * incremental twin of `operators.AsofJoin.backward` (batch oracle:
    * q127): per user the state is ONLY the latest view (timestamp,
    * event id, value) — O(1) per key, never a buffer of history — and
    * each purchase emits enriched with that view when it lies within
    * `toleranceMs` at-or-before the purchase. Tie discipline matches the
    * batch operator exactly: a view at the purchase's own timestamp
    * matches (views order before purchases at equal ts), concurrent
    * views resolve to the highest event id. Within a micro-batch events
    * are processed in event-time order; across batches the
    * backward-only guard (`st.ms <= purchase ms`) keeps the semantics
    * monotone when a purchase arrives after a newer view — the standard
    * stateful-asof caveat a true event-time-ordered per-key delivery
    * (or the batch form) does not have.
    */
  def asofEnrich(events: Dataset[Delivered], toleranceMs: Long = 3600000L)
      : Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Delivered], state: GroupState[AsofState]) =>
          val sorted = rows.toSeq.sortBy(e =>
            (e.ts.getTime, if (e.event_type == "view") 0 else 1, e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[AsofOut]
          sorted.foreach { e =>
            val ms = e.ts.getTime
            e.event_type match {
              case "view" =>
                if (st == null || ms > st.ms ||
                    (ms == st.ms && e.event_id > st.eventId))
                  st = AsofState(ms, e.event_id, e.value)
              case "purchase" =>
                if (st != null && st.ms <= ms && st.ms >= ms - toleranceMs)
                  out += AsofOut(userId, ms, Some(st.ms), Some(st.value))
                else
                  out += AsofOut(userId, ms, None, None)
              case _ => ()
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Custom-state sessionizer via flatMapGroupsWithState — the
    * KeyValueGroupedDataset escape hatch for session logic the built-in
    * operators can't express (emits a session when the 30-min gap elapses
    * or processing-time timeout fires).
    */
  def statefulSessionize(events: Dataset[Event], gapMs: Long = 30L * 60 * 1000)
      : Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          // sort this micro-batch's events; fold sessions, emit closed ones
          val sorted = rows.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.orNull
          val out = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            val ms = e.ts.getTime
            st match {
              case null =>
                st = SessionState(ms, ms, 1)
              case s if ms - s.lastMs > gapMs =>
                out += SessionOut(userId, s.start, s.lastMs, s.n)
                st = SessionState(ms, ms, 1)
              case s =>
                st = s.copy(lastMs = ms, n = s.n + 1)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }
}
