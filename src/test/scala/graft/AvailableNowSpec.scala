package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Trigger.AvailableNow: the incremental-batch discipline — process
  * everything present, checkpoint, stop on its own. A second
  * invocation over the same checkpoint must process ONLY data that
  * arrived in between, and the union of the two runs must equal the
  * batch answer. This is how a 100 TB pipeline runs "streaming"
  * semantics on a scheduler. */
class AvailableNowSpec extends AnyFunSuite {
  import TestSession._

  test("available-now runs drain the backlog incrementally") {
    val d = java.nio.file.Files.createTempDirectory("graft_avnow")
    val ckpt = d.resolve("ckpt").toString
    val ev = Tables(spark, sfDir).events
    val n = ev.count()
    val firstHalf = ev.limit((n / 2).toInt)
    val secondHalf = ev.exceptAll(firstHalf)
    firstHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("in/p1").toString)

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(ev.schema)
        .parquet(d.toString + "/in/p*")
      val q = stream
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName("avnow_out")
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination(120000) finally q.stop()
    }

    runOnce() // drains the first file and STOPS on its own
    val afterFirst = spark.table("avnow_out")
      .agg(sum(col("n"))).head().getLong(0)
    assert(afterFirst == firstHalf.count())

    secondHalf.coalesce(1).write.mode("overwrite")
      .parquet(d.resolve("in/p2").toString)
    runOnce() // resumes from the checkpoint, processes only p2
    val streamed = spark.table("avnow_out")
    val batch = Tables(spark, sfDir).events
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).isEmpty &&
      batch.exceptAll(streamed).isEmpty)
  }
}
