package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SeqMatchOp
import graft.streaming.{EventStreams, StreamingMatch}

/** The streaming MATCH operator must agree exactly with the batch
  * matcher over the same events (single micro-batch drive). */
class StreamingMatchSpec extends AnyFunSuite {
  import TestSession._

  lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_match_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("streaming MATCH equals batch MATCH on the full stream") {
    val pattern = "click view* purchase"
    val stream = EventStreams.readEvents(spark, eventsDir)
    val q = StreamingMatch.matches(stream, pattern)
      .writeStream.outputMode("append")
      .format("memory").queryName("match_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("match_out")
      .select(col("user_id"), col("match_id"), col("n_rows"),
        col("first_ord"), col("last_ord"), col("path"))
    val batch = SeqMatchOp.matchPattern(
      Tables(spark, sfDir).events, "user_id", "ts", "event_type", pattern)
      .select(col("user_id"), col("match_id"), col("n_rows"),
        col("first_ord"), col("last_ord"), col("path"))

    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }

  test("streaming MATCH state carries across micro-batches") {
    // split the events into two files so the file source produces at
    // least two batches with maxFilesPerTrigger=1; cross-batch matches
    // (run begun in batch 1, completed in batch 2) must still emit.
    val d = java.nio.file.Files.createTempDirectory("graft_match_2batch")
    val ev = Tables(spark, sfDir).events.orderBy(col("ts"), col("event_id"))
    val n = ev.count()
    // halve by ts order so runs straddle the boundary for some user
    val firstHalf = ev.limit((n / 2).toInt)
    val secondHalf = ev.exceptAll(firstHalf)
    firstHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p1").toString)
    // file source lists lexicographically; ensure p1 then p2
    secondHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p2").toString)

    val stream = spark.readStream
      .schema(firstHalf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString + "/p*")
    val q = StreamingMatch.matches(stream, "click view* purchase")
      .writeStream.outputMode("append")
      .format("memory").queryName("match_out_2b")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("match_out_2b").count()
    val batch = SeqMatchOp.matchPattern(
      Tables(spark, sfDir).events, "user_id", "ts", "event_type",
      "click view* purchase").count()
    assert(streamed == batch)
  }
}
