package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    new Timestamp(1700000000000L + minute * 60000L)

  test("windowed counts run incrementally over a MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.windowedCounts(input.toDF(), window_ = "1 hour")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        EventStreams.Event(ts(0), 1L, "click", 1.0),
        EventStreams.Event(ts(10), 1L, "click", 2.0),
        EventStreams.Event(ts(70), 2L, "view", 3.0))
      q.processAllAvailable()
      // advance the watermark far enough to close the first windows
      input.addData(EventStreams.Event(ts(400), 3L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
      val clicks = rows.find(r => r.getString(1) == "click" && r.getLong(2) == 2L)
      assert(clicks.isDefined, s"expected closed click window in ${rows.mkString(";")}")
      assert(clicks.get.getDouble(3) == 3.0)
    } finally q.stop()
  }

  test("stream-stream attribution join matches its batch twin on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clickRows = Seq(
      EventStreams.Event(ts(0), 1L, "click", 0.0),   // 10 min before buy -> in
      EventStreams.Event(ts(5), 1L, "click", 0.0),   //  5 min before buy -> in
      EventStreams.Event(ts(9), 2L, "click", 0.0),   // other user -> out
      EventStreams.Event(ts(-40), 1L, "click", 0.0)) // 50 min before -> outside 30m
    val buyRows = Seq(
      EventStreams.Event(ts(10), 1L, "purchase", 9.99),
      EventStreams.Event(ts(20), 3L, "purchase", 5.0)) // no clicks -> no join rows
    val clicks = MemoryStream[EventStreams.Event]
    val buys = MemoryStream[EventStreams.Event]
    val q = EventStreams.attributionJoin(clicks.toDF(), buys.toDF())
      .writeStream.format("memory").queryName("attr_join")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(clickRows: _*)
      buys.addData(buyRows: _*)
      q.processAllAvailable()
      // advance both watermarks so the interval state closes
      clicks.addData(EventStreams.Event(ts(400), 9L, "click", 0.0))
      buys.addData(EventStreams.Event(ts(400), 9L, "purchase", 0.0))
      q.processAllAvailable()
      val streamed = spark.table("attr_join")
        .select(col("user_id"), col("ts"), col("c_ts")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      // batch twin: the same interval join as plain DataFrame code
      val batch = buyRows.toDF().join(
        clickRows.toDF().select(col("user_id").as("c_user"), col("ts").as("c_ts")),
        col("c_user") === col("user_id") &&
          col("c_ts") >= col("ts") - expr("INTERVAL 30 minutes") &&
          col("c_ts") < col("ts"))
        .select(col("user_id"), col("ts"), col("c_ts")).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(batch.size == 2) // exactly the two in-window user-1 clicks
    } finally q.stop()
  }

  test("streaming ingest dedup drops re-delivered events across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Delivered]
    val q = EventStreams.dedupedEvents(input.toDF(), lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup_events")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        EventStreams.Delivered(1L, ts(0), 1L, "click", 1.0),
        EventStreams.Delivered(2L, ts(1), 1L, "view", 2.0),
        EventStreams.Delivered(1L, ts(0), 1L, "click", 1.0)) // same-batch dup
      q.processAllAvailable()
      // re-delivery in a LATER micro-batch, still within the watermark
      input.addData(
        EventStreams.Delivered(2L, ts(2), 1L, "view", 2.0),
        EventStreams.Delivered(3L, ts(3), 2L, "click", 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_events").select("event_id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L),
        s"each event id must survive exactly once, got $ids")
    } finally q.stop()
  }

  test("session_window groups events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.sessionWindows(input.toDF(), gap = "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        EventStreams.Event(ts(0), 1L, "click", 1.0),
        EventStreams.Event(ts(10), 1L, "click", 1.0), // same session
        EventStreams.Event(ts(120), 1L, "click", 1.0)) // new session
      q.processAllAvailable()
      input.addData(EventStreams.Event(ts(2000), 9L, "click", 1.0)) // push watermark
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .filter(col("user_id") === 1L).collect()
      assert(rows.length == 2, s"expected 2 closed sessions, got ${rows.mkString(";")}")
      assert(rows.map(_.getLong(3)).sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer emits closed sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val q = EventStreams.statefulSessionize(input.toDS())
      .writeStream.format("memory").queryName("stateful_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        EventStreams.Event(ts(0), 1L, "click", 1.0),
        EventStreams.Event(ts(5), 1L, "click", 1.0))
      q.processAllAvailable()
      // second batch: gap > 30min closes the first session
      input.addData(EventStreams.Event(ts(100), 1L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("stateful_sessions").collect()
      assert(rows.length == 1, s"expected 1 closed session, got ${rows.mkString(";")}")
      assert(rows.head.getInt(3) == 2)
    } finally q.stop()
  }

  test("streaming as-of enrichment matches the batch AsofJoin on the same events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evts = Seq(
      EventStreams.Delivered(1L, ts(0), 1L, "view", 10.0),
      EventStreams.Delivered(2L, ts(5), 1L, "view", 11.0),  // newer view wins
      EventStreams.Delivered(3L, ts(10), 1L, "purchase", 99.0), // -> view@5
      EventStreams.Delivered(4L, ts(10), 2L, "purchase", 50.0), // no view -> null
      EventStreams.Delivered(5L, ts(70), 3L, "view", 7.0),
      EventStreams.Delivered(6L, ts(200), 3L, "purchase", 1.0)) // 130min > 1h -> null
    val input = MemoryStream[EventStreams.Delivered]
    val q = EventStreams.asofEnrich(input.toDS())
      .writeStream.format("memory").queryName("asof_enrich")
      .outputMode(OutputMode.Append()).start()
    try {
      // split across micro-batches at an event-time boundary (the
      // per-key state carries the last view between batches)
      input.addData(evts.take(3): _*)
      q.processAllAvailable()
      input.addData(evts.drop(3): _*)
      q.processAllAvailable()
      val streamed = spark.table("asof_enrich").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Double]))).toSet
      // batch twin on the same rows through AsofJoin.backward
      val base = evts.map(e => (e.user_id, e.ts.getTime, e.event_id,
        e.event_type, e.value))
        .toDF("user_id", "ts_ms", "event_id", "event_type", "value")
      val quotes = base.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          col("value").as("view_value"))
      val trades = base.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ms"), col("event_id"))
      val batch = graft.operators.AsofJoin.backward(
        trades, quotes, by = "user_id", on = "ts_ms", seq = "event_id",
        payload = Seq("view_value"), tolerance = Some(3600000L))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(r.fieldIndex("asof_on"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("asof_view_value")))
            .map(_.asInstanceOf[Double]))).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(streamed.size == 3)
      assert(streamed.exists { case (u, _, m, v) =>
        u == 1L && m.contains(ts(5).getTime) && v.contains(11.0) })
    } finally q.stop()
  }
}
