package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture-vintage regression pin: the harness has shipped `events.ts`
  * both as TIMESTAMP(NANOS) — which Spark reads as a nanosecond BIGINT
  * under nanosAsLong — and as plain `timestamp[us]` (TIMESTAMP_NTZ).
  * Round 8 broke on exactly this flip (hard-coded `ts DIV 1000000`
  * failed analysis on the NTZ vintage). Every event query must produce
  * IDENTICAL results from either physical encoding of the same events.
  */
class EventsTsSpec extends SparkSpec {

  test("event queries produce identical results from both ts vintages") {
    import spark.implicits._
    val baseMs = 1700000000000L
    // a small deterministic event log: views/clicks/purchases across
    // two users, session gaps, an attribution window, an as-of match
    val rows = (1L to 40L).map { i =>
      val kind = (i % 4) match {
        case 0 => "purchase"
        case 1 => "view"
        case 2 => "click"
        case _ => "view"
      }
      (i, baseMs + i * 137000L + (i % 7) * 3600000L, 1L + i % 3, kind,
        i * 1.25, s"""{"k":${i % 5}}""")
    }
    val flat = rows.toDF("event_id", "ts_raw", "user_id", "event_type",
      "value", "props")
    val dirA = "/tmp/graft-ts-bigint"
    val dirB = "/tmp/graft-ts-timestamp"
    // vintage A: nanosecond BIGINT (the nanosAsLong read shape)
    flat.withColumn("ts", col("ts_raw") * 1000000L)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dirA/events.parquet")
    // vintage B: timestamp[us] / TIMESTAMP_NTZ (session tz pinned UTC)
    flat.withColumn("ts",
        timestamp_millis(col("ts_raw")).cast("timestamp_ntz"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dirB/events.parquet")
    for (q <- Events.all) {
      val a = q.build(spark, dirA).collect().map(_.toSeq).toSeq
      val b = q.build(spark, dirB).collect().map(_.toSeq).toSeq
      assert(a == b, s"${q.name}: vintages diverge\nA=$a\nB=$b")
      assert(a.nonEmpty, s"${q.name}: empty result")
    }
  }
}
