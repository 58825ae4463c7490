package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Stream-STATIC join: the streaming side enriches against a batch
  * dimension (user -> cohort bucket). The static side plans as a
  * broadcast into every micro-batch — the standard way a 100-TB
  * event firehose picks up slowly-changing dimensions without any
  * stream-side state. Results must equal the identical batch join. */
class StreamStaticJoinSpec extends AnyFunSuite {
  import TestSession._

  lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events_ssj")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("stream enriched by a static dimension equals the batch join") {
    // static dimension derived from the same corpus: user -> bucket
    val dim = Tables(spark, sfDir).events
      .select(col("user_id")).distinct()
      .withColumn("cohort", pmod(col("user_id"), lit(4)))

    val stream = EventStreams.readEvents(spark, eventsDir)
      .join(broadcast(dim), Seq("user_id"))
      .groupBy(col("cohort"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("ssj_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("ssj_out")
      .select(col("cohort"), col("event_type"), col("n"))
    val batch = Tables(spark, sfDir).events
      .join(broadcast(dim), Seq("user_id"))
      .groupBy(col("cohort"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "stream-static enrichment diverged from the batch join")
    // the whole corpus flowed through
    val total = spark.table("ssj_out").agg(sum(col("n"))).collect()(0)
      .getLong(0)
    assert(total == Tables(spark, sfDir).events.count())
  }
}
