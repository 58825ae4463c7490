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
  }
}
