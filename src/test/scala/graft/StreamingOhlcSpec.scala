package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming OHLC candles: the declarative min_by/max_by windowed
  * aggregate under Structured Streaming must equal the batch q142
  * plan (which resolves open/close via window ranks — a different
  * mechanism over the same semantics). */
class StreamingOhlcSpec extends AnyFunSuite {
  import TestSession._

  lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events_ohlc")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming min_by/max_by candles equal the batch rank-based q142") {
    val stream = EventStreams.readEvents(spark, eventsDir)
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), window(col("ts"), "1 hour").as("w"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n"))
      .where(col("n") >= 2)
      .select(col("user_id"), col("w.start").as("hr"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("ohlc_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("ohlc_out")
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("q142_ohlc")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }
}
