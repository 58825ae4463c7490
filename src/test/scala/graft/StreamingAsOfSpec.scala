package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExtendedOps
import graft.streaming.StreamingAsOf

/** The streaming as-of join must reproduce the batch AsOfJoinExec
  * output, including across micro-batch boundaries. */
class StreamingAsOfSpec extends AnyFunSuite {
  import TestSession._

  private def batchAsOf() = {
    val ev = Tables(spark, sfDir).events
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("ref_event_id"),
        col("value").cast("double").as("ref_value"))
    ExtendedOps.asofJoinExec(
      purchases, clicks, keyCols = Seq("user_id"), ordCol = "ts")
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"), col("ts"),
        col("ref_event_id").cast("long").as("ref_event_id"),
        col("ref_value"))
  }

  test("streaming as-of equals batch exec across micro-batches") {
    // time-ordered files: per-key cross-batch delivery stays in ts
    // order, the streaming operator's ordered-stream contract
    val d = java.nio.file.Files.createTempDirectory("graft_asof_stream")
    val ev = Tables(spark, sfDir).events.orderBy(col("ts"), col("event_id"))
    val n = ev.count()
    val firstHalf = ev.limit((n / 2).toInt)
    val secondHalf = ev.exceptAll(firstHalf)
    firstHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p1").toString)
    secondHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("p2").toString)

    val stream = spark.readStream
      .schema(firstHalf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(d.toString + "/p*")
    val q = StreamingAsOf.asof(stream, "purchase", "click")
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out")
      .start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("asof_out")
    val batch = batchAsOf()
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }
}
