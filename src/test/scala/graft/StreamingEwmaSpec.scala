package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, StreamingEwma}

/** Incremental EWMA chart must equal the batch fold over the same
  * prefix — including when the stream is split across micro-batch
  * boundaries (the O(1) carried (z, w) state is the whole point). */
class StreamingEwmaSpec extends AnyFunSuite {
  import TestSession._

  private val mu = 50.0
  private val sigma = 20.0
  private val lambda = 0.2

  /** Batch twin: the exact same per-key fold, run locally over the
    * event-time-ordered rows. */
  private def batchReadings: Map[String, (Long, Double, Double)] = {
    val rows = Tables(spark, sfDir).events
      .select(col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .orderBy(col("ts"), col("event_id"))
      .collect()
    rows.groupBy(_.getString(0)).map { case (k, rs) =>
      var z = mu; var w = 1.0; var n = 0L
      for (r <- rs) {
        z = lambda * r.getDouble(3) + (1.0 - lambda) * z
        w = w * (1.0 - lambda) * (1.0 - lambda)
        n += 1
      }
      k -> ((n, z, w))
    }
  }

  private def latestPerKey(table: String) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("n").desc)
    spark.table(table)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("key"), col("n"), col("z"), col("ucl"), col("lcl"),
        col("outf"))
  }

  test("one-batch streaming EWMA equals the batch fold") {
    val d = java.nio.file.Files.createTempDirectory("graft_ewma_1")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StreamingEwma.monitor(
        EventStreams.readEvents(spark, d.toString), "event_type",
        "value", mu, sigma, lambda)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_one").start()
    try q.processAllAvailable() finally q.stop()
    val got = latestPerKey("ewma_one").collect()
    val want = batchReadings
    assert(got.length == want.size)
    for (r <- got) {
      val (n, z, w) = want(r.getAs[String]("key"))
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-9, s"z: $r")
      val hw = 3.0 * sigma *
        math.sqrt(lambda / (2.0 - lambda) * (1.0 - w))
      assert(math.abs(r.getAs[Double]("ucl") - (mu + hw)) < 1e-9)
      assert(math.abs(r.getAs[Double]("lcl") - (mu - hw)) < 1e-9)
      assert(r.getAs[Boolean]("outf") ==
        (z > mu + hw || z < mu - hw))
    }
  }

  test("state carries exactly across a time-split micro-batch boundary") {
    val d = java.nio.file.Files.createTempDirectory("graft_ewma_2")
    val ev = Tables(spark, sfDir).events
      .orderBy(col("ts"), col("event_id"))
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
    val q = StreamingEwma.monitor(stream, "event_type", "value",
        mu, sigma, lambda)
      .writeStream.outputMode("append")
      .format("memory").queryName("ewma_two").start()
    try q.processAllAvailable() finally q.stop()
    // two micro-batches -> two emits per key; the final reading must
    // still equal the single batch fold (state carried, not reset)
    val emits = spark.table("ewma_two")
    assert(emits.groupBy(col("key")).count()
      .agg(min(col("count"))).head().getLong(0) >= 2L)
    val got = latestPerKey("ewma_two").collect()
    val want = batchReadings
    for (r <- got) {
      val (nn, z, _) = want(r.getAs[String]("key"))
      assert(r.getAs[Long]("n") == nn)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-9,
        s"carried z mismatch: $r")
    }
  }
}
