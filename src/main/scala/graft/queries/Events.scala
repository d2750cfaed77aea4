package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}
import graft.sources.Tables
import Q._

/** Event-stream battery over the `events` table. The reference has NO
  * streaming (SURVEY.md §2.10), so these are additive: the same windowed
  * semantics the Structured Streaming module (`graft.streaming`) runs
  * incrementally are expressed here as batch queries with oracles —
  * batch/stream parity is the point.
  */
object Events {

  /** Epoch-milliseconds for the events `ts` column, schema-adaptive.
    *
    * The harness has shipped `events.parquet` with two different physical
    * types for `ts` across fixture generations: TIMESTAMP(NANOS) — which
    * Spark 4 reads as a nanosecond BIGINT under
    * spark.sql.legacy.parquet.nanosAsLong — and plain `timestamp[us]`,
    * which resolves as TIMESTAMP_NTZ (pyarrow writes isAdjustedToUTC=false).
    * Every event query derives wall-clock ms through this one helper so the
    * battery survives either fixture vintage. All arithmetic stays integral
    * (ns epochs exceed 2^53; a double division would silently lose ms).
    * The NTZ branch casts via the session timezone, which Verify/tests pin
    * to UTC — matching DuckDB's naive-UTC `epoch_ms(ts)` oracle exactly.
    */
  private def tsMs(e: DataFrame): Column = e.schema("ts").dataType match {
    case LongType            => expr("ts DIV 1000000")
    case _: TimestampNTZType => expr("unix_micros(CAST(ts AS timestamp)) DIV 1000")
    case _                   => expr("unix_micros(ts) DIV 1000")
  }

  /** q80: tumbling-window aggregation + JSON property extraction — daily
    * buckets by epoch arithmetic (portable across engines; Spark's
    * window() struct is the production form, see EventStreamsSpec),
    * sum/count per (event_type, day).
    */
  val q80TumblingWindow = QueryDef(
    "q80_tumbling_window",
    (s, dir) => {
      val e = Tables.events(s, dir)
      e.withColumn("ts_ms", tsMs(e))
        .select(col("event_type"),
          expr("ts_ms DIV 86400000").as("day_bucket"),
          col("value"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"), col("day_bucket"))
        .agg(count(lit(1)).as("n_events"),
             dsum(col("value"), 2).as("sum_value"),
             sum(col("k")).as("sum_k"))
        .orderBy(col("event_type"), col("day_bucket"))
    },
    Some(s"""
      SELECT event_type,
             epoch_ms(ts) // 86400000 AS day_bucket,
             count(*) AS n_events,
             ${sqlDsum("value", 2)} AS sum_value,
             CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
      FROM events
      GROUP BY 1, 2
      ORDER BY event_type, day_bucket
    """.stripMargin.trim))

  /** q81: gap-based sessionization — lag over (user, ts), new-session
    * flag at >30 min gaps, running sum assigns session ids, then session
    * stats roll up per user (the mapGroupsWithState batch equivalent;
    * the streaming form lives in `graft.streaming.EventStreams`).
    */
  val q81Sessionize = QueryDef(
    "q81_sessionize",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val sessions = e
        .withColumn("ms", tsMs(e))
        .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ms").isNull ||
               col("ms") - col("prev_ms") > 30L * 60L * 1000L, 1L).otherwise(0L))
        .withColumn("session_idx",
          sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
             ((max(col("ms")) - min(col("ms"))) / lit(1000L)).as("duration_s"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
             sum(col("n_events")).as("n_events"),
             q2(dsum(col("duration_s"), 6) / count(lit(1))).as("avg_duration_s"))
        .orderBy(col("user_id"))
    },
    Some(s"""
      WITH marked AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ms,
               lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ms
        FROM events),
      flagged AS (
        SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 30*60*1000
                       THEN 1 ELSE 0 END AS new_session
        FROM marked),
      numbered AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM flagged),
      per_session AS (
        SELECT user_id, session_idx, count(*) AS n_events,
               (max(ms) - min(ms)) / 1000 AS duration_s
        FROM numbered GROUP BY 1, 2)
      SELECT user_id, count(*) AS n_sessions, CAST(sum(n_events) AS BIGINT) AS n_events,
             ${sql2(s"${sqlDsum("duration_s", 6)} / count(*)")} AS avg_duration_s
      FROM per_session
      GROUP BY user_id
      ORDER BY user_id
    """.stripMargin.trim))

  /** q82: ingest dedup under at-least-once delivery — the batch analogue
    * of `EventStreams.dedupedEvents` (watermark-bounded streaming
    * `dropDuplicatesWithinWatermark`): a deterministic re-delivery
    * (every 7th event arrives twice) is collapsed back to unique events;
    * the census shows received vs unique vs dropped per type. The
    * distinct shuffles on event_id (unique-grain key), never on the hot
    * event_type. */
  val q82IngestDedup = QueryDef(
    "q82_ingest_dedup",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val delivered = e.unionByName(e.filter(col("event_id") % 7 === 0))
      delivered.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_received"),
          countDistinct(col("event_id")).as("n_unique"),
          (count(lit(1)) - countDistinct(col("event_id"))).as("n_dupes_dropped"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH delivered AS (
        SELECT * FROM events
        UNION ALL
        SELECT * FROM events WHERE event_id % 7 = 0)
      SELECT event_type, count(*) AS n_received,
             count(DISTINCT event_id) AS n_unique,
             count(*) - count(DISTINCT event_id) AS n_dupes_dropped
      FROM delivered
      GROUP BY event_type
      ORDER BY event_type
    """.stripMargin.trim))

  /** q83: interval ATTRIBUTION join — each purchase picks up the same
    * user's clicks in the preceding 30 minutes (click-through
    * attribution), then a daily roll-up of purchases / attributed
    * purchases / click volume / attributed value / worst click-to-buy
    * gap. Batch twin of `EventStreams.attributionJoin` (the watermarked
    * stream-stream interval join — state bounded by watermark +
    * interval). Scale shape: both sides shuffle once on user_id and the
    * range predicate evaluates inside the join; the per-purchase
    * aggregate collapses click fan-out BEFORE the daily roll-up so the
    * wide purchase row never multiplies through the day shuffle. All
    * time arithmetic is integral ns→ms DIV (ns epochs exceed 2^53).
    */
  val q83AttributionJoin = QueryDef(
    "q83_attribution_join",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val base = e.select(col("event_id"), col("user_id"), col("event_type"),
        tsMs(e).as("ts_ms"), col("value"))
      val clicks = base.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts_ms").as("c_ts"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts_ms").as("p_ts"), col("value").as("p_value"))
      val joined = purchases.join(clicks,
        col("c_user") === col("p_user") &&
          col("c_ts") >= col("p_ts") - lit(1800000L) &&
          col("c_ts") < col("p_ts"), "left")
      val perPurchase = joined
        .groupBy(col("p_id"), col("p_ts"), col("p_value"))
        .agg(count(col("c_ts")).as("n_clicks"),
          max(col("c_ts")).as("last_click_ts"))
      perPurchase
        .select(
          expr("p_ts DIV 86400000").as("day_bucket"),
          col("p_value"), col("n_clicks"),
          (col("n_clicks") > 0).as("attributed"),
          (col("p_ts") - col("last_click_ts")).as("gap_ms"))
        .groupBy(col("day_bucket"))
        .agg(
          count(lit(1)).as("n_purchases"),
          count(when(col("attributed"), lit(1))).as("n_attributed"),
          sum(col("n_clicks")).as("n_clicks_in_window"),
          dsum(when(col("attributed"), col("p_value")), 2).as("attributed_value"),
          max(col("gap_ms")).as("max_click_gap_ms"))
        .orderBy(col("day_bucket"))
    },
    Some(s"""
      WITH base AS (
        SELECT event_id, user_id, event_type,
               epoch_ms(ts) AS ts_ms, value
        FROM events),
      clicks AS (
        SELECT user_id AS c_user, ts_ms AS c_ts FROM base
        WHERE event_type = 'click'),
      purchases AS (
        SELECT event_id AS p_id, user_id AS p_user, ts_ms AS p_ts,
               value AS p_value
        FROM base WHERE event_type = 'purchase'),
      per_purchase AS (
        SELECT p_id, p_ts, p_value,
               count(c_ts) AS n_clicks, max(c_ts) AS last_click_ts
        FROM purchases LEFT JOIN clicks
          ON c_user = p_user AND c_ts >= p_ts - 1800000 AND c_ts < p_ts
        GROUP BY p_id, p_ts, p_value)
      SELECT p_ts // 86400000 AS day_bucket,
             count(*) AS n_purchases,
             count(CASE WHEN n_clicks > 0 THEN 1 END) AS n_attributed,
             CAST(sum(n_clicks) AS BIGINT) AS n_clicks_in_window,
             ${sqlDsum("CASE WHEN n_clicks > 0 THEN p_value END", 2)}
               AS attributed_value,
             max(p_ts - last_click_ts) AS max_click_gap_ms
      FROM per_purchase
      GROUP BY 1
      ORDER BY day_bucket
    """.stripMargin.trim))

  /** q127: backward AS-OF join — each purchase enriched with the same
    * user's most recent view at-or-before it (`AsofJoin.backward`, the
    * merge-shaped formulation: one shuffle on user_id, a running
    * last-ignoring-nulls window, NO range-join pair explosion), with a
    * 1-hour staleness tolerance voiding matches against long-dead
    * context. Roll-up per user: trade count, matched count, total and
    * worst view→purchase lag, and the decimal-exact sum of the matched
    * view values. Tie discipline: a view at exactly the purchase
    * timestamp matches (side tag orders it first) and concurrent views
    * resolve to the highest event_id — both pinned in the oracle's
    * identical window ordering. Lag arithmetic is integral ms (ns
    * epochs exceed 2^53, so ts goes through the integral DIV ladder).
    */
  val q127AsofJoin = QueryDef(
    "q127_asof_join",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val base = e.select(col("event_id"), col("user_id"),
        tsMs(e).as("ts_ms"), col("event_type"), col("value"))
      val quotes = base.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          q2(col("value")).as("view_value"))
      val trades = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ms"), col("event_id"))
      val joined = graft.operators.AsofJoin.backward(
        trades, quotes, by = "user_id", on = "ts_ms", seq = "event_id",
        payload = Seq("view_value"), tolerance = Some(3600000L))
      joined.groupBy(col("user_id"))
        .agg(
          count(lit(1)).as("n_trades"),
          count(col("asof_on")).as("n_matched"),
          sum(col("ts_ms") - col("asof_on")).as("total_lag_ms"),
          max(col("ts_ms") - col("asof_on")).as("max_lag_ms"),
          dsum(col("asof_view_value"), 2).as("matched_view_value"))
        .orderBy(col("user_id"))
    },
    Some(s"""
      WITH base AS (
        SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms, value
        FROM events),
      u AS (
        SELECT user_id, ts_ms, event_id, 0 AS side,
               ${sql2("value")} AS view_value
        FROM base WHERE event_type = 'view'
        UNION ALL
        SELECT user_id, ts_ms, event_id, 1, NULL
        FROM base WHERE event_type = 'purchase'),
      carried AS (
        SELECT *,
          last_value(CASE WHEN side = 0 THEN ts_ms END IGNORE NULLS) OVER w
            AS m_ts,
          last_value(CASE WHEN side = 0 THEN view_value END IGNORE NULLS) OVER w
            AS m_value
        FROM u
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, side, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      matched AS (
        SELECT user_id, ts_ms,
               CASE WHEN m_ts >= ts_ms - 3600000 THEN m_ts END AS a_ts,
               CASE WHEN m_ts >= ts_ms - 3600000 THEN m_value END AS a_value
        FROM carried WHERE side = 1)
      SELECT user_id, count(*) AS n_trades, count(a_ts) AS n_matched,
             CAST(sum(ts_ms - a_ts) AS BIGINT) AS total_lag_ms,
             max(ts_ms - a_ts) AS max_lag_ms,
             ${sqlDsum("a_value", 2)} AS matched_view_value
      FROM matched
      GROUP BY user_id
      ORDER BY user_id
    """.stripMargin.trim))

  val all: Seq[QueryDef] = Seq(
    q80TumblingWindow, q81Sessionize, q82IngestDedup, q83AttributionJoin,
    q127AsofJoin)
}
