package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import Q._

/** Event-stream battery over the `events` table. The reference has NO
  * streaming (SURVEY.md §2.10), so these are additive: the same windowed
  * semantics the Structured Streaming module (`graft.streaming`) runs
  * incrementally are expressed here as batch queries with oracles —
  * batch/stream parity is the point.
  */
object Events {

  /** q80: tumbling-window aggregation + JSON property extraction — daily
    * buckets by epoch arithmetic (portable across engines; Spark's
    * window() struct is the production form, see EventStreamsSpec),
    * sum/count per (event_type, day).
    *
    * `ts` arrives as NANOSECOND BIGINTs (the harness parquet uses
    * TIMESTAMP(NANOS), which Spark 4 only reads via
    * spark.sql.legacy.parquet.nanosAsLong). The ns→ms conversion uses
    * integral DIV — ns epoch values exceed 2^53, so any double division
    * would silently lose milliseconds.
    */
  val q80TumblingWindow = QueryDef(
    "q80_tumbling_window",
    (s, dir) => {
      val e = Tables.events(s, dir)
      e.select(col("event_type"),
          expr("(ts DIV 1000000) DIV 86400000").as("day_bucket"),
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
        .withColumn("ms", expr("ts DIV 1000000"))
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

  val all: Seq[QueryDef] = Seq(q80TumblingWindow, q81Sessionize, q82IngestDedup)
}
