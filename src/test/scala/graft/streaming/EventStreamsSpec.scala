package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed hourly window equals the batch hourly aggregation") {
    val streamed = EventStreams.drainToTable(
      spark,
      EventStreams.hourlyWindowed(EventStreams.eventsStream(spark, sfDir)),
      "spec_stream_hourly")
      .select("hour_bucket", "event_type", "n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionization matches the batch window-function form") {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[EventStreams.Event]
    val streaming = EventStreams.sessionizeStream(events)
      .collect().map(s => (s.user_id, s.session_id, s.session_start, s.session_end, s.n_events))
      .toSet
    val batch = EventStreams.sessionizeBatch(Tables.load(spark, sfDir, "events"))
      .as[EventStreams.Session]
      .collect().map(s => (s.user_id, s.session_id, s.session_start, s.session_end, s.n_events))
      .toSet
    assert(streaming == batch,
      s"only-stream=${(streaming -- batch).take(3)} only-batch=${(batch -- streaming).take(3)}")
  }

  test("sessions respect the gap invariant: intra-session gaps <= 30 min, sessions ordered") {
    val sessions = EventStreams.sessionizeBatch(Tables.load(spark, sfDir, "events"))
    // session_end >= session_start, and per user sessions don't overlap
    assert(sessions.filter(col("session_end") < col("session_start")).count() == 0)
    val overlaps = sessions.alias("a").join(sessions.alias("b"),
      col("a.user_id") === col("b.user_id") &&
        (col("a.session_id") + 1) === col("b.session_id") &&
        expr("unix_micros(b.session_start) - unix_micros(a.session_end)") <= lit(EventStreams.SessionGapSeconds * 1000000L))
    assert(overlaps.count() == 0, "consecutive sessions closer than the gap")
  }
}
