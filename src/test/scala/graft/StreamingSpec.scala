package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams

/** Structured Streaming paths must reproduce the (oracle-checked)
  * batch results when run over the same static events table.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming 1h window agg matches batch q_events_window") {
    val streamed = EventStreams.runToMemory(
      EventStreams.window1h(EventStreams.readEvents(spark, sfDir)),
      "win1h", OutputMode.Complete())
      .select("window_start_s", "event_type", "n_events", "sum_value")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val batch = SparkEntry.queries("q_events_window")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(streamed == batch)
  }

  test("streaming dedup collapses duplicated events to distinct ids") {
    // double the stream so every event id arrives twice
    val doubled = EventStreams.readEvents(spark, sfDir)
      .union(EventStreams.readEvents(spark, sfDir))
    val streamed = EventStreams.runToMemory(
      EventStreams.dedupEvents(doubled).select("event_id"),
      "dedup", OutputMode.Append())
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val expected = Tables.load(spark, sfDir, "events").select("event_id").distinct().count()
    assert(streamed.count() == expected)
  }

  test("stream-stream interval join matches the batch equivalent") {
    val streamed = EventStreams.runToMemory(
      EventStreams.purchaseSignupJoin(EventStreams.readEvents(spark, sfDir)),
      "ssjoin", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = Tables.load(spark, sfDir, "events")
      .withColumn("us", expr("ts div 1000")) // microseconds, matching the stream
    val p = e.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("us").as("p_us"))
    val s2 = e.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("event_id").as("signup_id"),
        col("us").as("s_us"))
    val batch = p.join(s2,
      col("user_id") === col("s_user_id") &&
        col("s_us") <= col("p_us") && col("s_us") >= col("p_us") - 3600000000L)
      .select("purchase_id", "signup_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch)
  }

  test("stateful streaming sessionization matches batch q_events_sessionize") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = EventStreams.readEvents(spark, sfDir)
      .select("event_id", "ts", "user_id").as[EventStreams.EventRow]
    val streamed = EventStreams.runToMemory(
      EventStreams.sessionize(events).toDF(), "sessions", OutputMode.Update())
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = SparkEntry.queries("q_events_sessionize")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }
}
