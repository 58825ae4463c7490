package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Drives the Structured Streaming pipelines synchronously over the
  * events parquet (memory sink + processAllAvailable) and checks the
  * tumbling-window totals equal the batch q45 plan's totals. */
class StreamingSpec extends AnyFunSuite {
  import TestSession._

  /** File stream sources need a directory; stage the single events
    * parquet file into one. */
  lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming tumbling window agg matches batch equivalent") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    val q = EventStreams.tumblingCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_out")
      .agg(sum(col("n")).as("rows"), count(lit(1)).as("groups"))
      .collect()(0)
    val batch = SparkEntry.queries("q45_stream_window")(spark, sfDir)
      .agg(sum(col("n")).as("rows"), count(lit(1)).as("groups"))
      .collect()(0)
    assert(streamed.getLong(0) == batch.getLong(0))
    assert(streamed.getLong(1) == batch.getLong(1))
  }

  test("stream-stream join: purchases joined to clicks within an hour") {
    val clicks = EventStreams.readEvents(spark, eventsDir)
      .where(col("event_type") === "click")
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    val purchases = EventStreams.readEvents(spark, eventsDir)
      .where(col("event_type") === "purchase")
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
    val joined = purchases.join(clicks,
      col("p_user") === col("user_id") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("ss_join_out").count()
    // batch equivalent over the same data
    val ev = Tables(spark, sfDir).events
    val bc = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"))
    val bp = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val batch = bp.join(bc, col("p_user") === col("user_id") &&
      col("c_ts") <= col("p_ts") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR")).count()
    assert(streamed == batch)
    assert(streamed > 0)
  }

  test("streaming session windows produce bounded per-user sessions") {
    val stream = EventStreams.readEvents(spark, eventsDir)
    val q = EventStreams.sessionCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val sessions = spark.table("sessions_out")
    assert(sessions.count() > 0)
    // each session's event count must sum to the total event count
    val total = sessions.agg(sum(col("n_events"))).collect()(0).getLong(0)
    val events = Tables(spark, sfDir).events.count()
    assert(total == events)

    // row-for-row: the streamed sessions equal the batch session_window
    // plan (q151) — same operator, batch vs micro-batch execution
    val streamed = sessions
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q151_session_window")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
