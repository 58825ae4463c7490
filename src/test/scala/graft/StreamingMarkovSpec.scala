package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, StreamingMarkov}

/** Streaming Markov transition maintenance must aggregate to exactly
  * the batch window derivation — including transitions that straddle a
  * micro-batch boundary (O(1) last-event state per user). */
class StreamingMarkovSpec extends AnyFunSuite {
  import TestSession._

  private def batchCounts = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, sfDir).events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .count()
  }

  private def streamCounts(dir: String, name: String) = {
    val q = StreamingMarkov.transitions(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("append")
      .format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .groupBy(col("from_type"), col("to_type")).count()
  }

  test("one-batch streaming transitions equal the batch derivation") {
    val d = java.nio.file.Files.createTempDirectory("graft_markov_1")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val s = streamCounts(d.toString, "markov_one")
    val b = batchCounts
    assert(s.count() > 0)
    assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty)
  }

  test("boundary transitions survive a micro-batch split") {
    val d = java.nio.file.Files.createTempDirectory("graft_markov_2")
    val ev = Tables(spark, sfDir).events.orderBy(col("ts"), col("event_id"))
    val n = ev.count()
    val firstHalf = ev.limit((n / 2).toInt)
    val secondHalf = ev.exceptAll(firstHalf)
    firstHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p1").toString)
    secondHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p2").toString)
    val stream = spark.readStream
      .schema(Tables(spark, sfDir).events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(d.toString + "/p*")
    val q = StreamingMarkov.transitions(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("markov_two")
      .start()
    try q.processAllAvailable() finally q.stop()
    val s = spark.table("markov_two")
      .groupBy(col("from_type"), col("to_type")).count()
    val b = batchCounts
    assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty,
      "split-batch transition counts diverged from batch")
  }
}
