package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, StreamingCusum}

/** Incremental CUSUM must equal the batch max-drawup fold over the
  * same prefix — including when the stream is split across micro-batch
  * boundaries (the O(1) carried state is the whole point). */
class StreamingCusumSpec extends AnyFunSuite {
  import TestSession._

  private val mu = 50.0 // fixed control-chart baseline for `value`

  /** Batch twin: running dev sum + min prefix windows per type. */
  private def batchReadings = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, sfDir).events
      .withColumn("s", sum(col("value") - lit(mu)).over(w))
      .withColumn("minp", least(lit(0.0), min(col("s")).over(w)))
      .withColumn("cusum", col("s") - col("minp"))
      .groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n"),
        max(col("cusum")).as("max_cusum"),
        max_by(col("cusum"), struct(col("ts"), col("event_id")))
          .as("final_cusum"))
  }

  private def latestPerKey(table: String) = {
    // the memory sink accumulates one emit per key per micro-batch;
    // the reading with the largest n is the latest
    val w = Window.partitionBy(col("key")).orderBy(col("n").desc)
    spark.table(table)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("key"), col("n"), col("max_cusum"), col("final_cusum"))
  }

  test("one-batch streaming CUSUM equals the batch fold") {
    val d = java.nio.file.Files.createTempDirectory("graft_cusum_1")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StreamingCusum.monitor(
        EventStreams.readEvents(spark, d.toString), "event_type", "value", mu)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_one").start()
    try q.processAllAvailable() finally q.stop()
    val s = latestPerKey("cusum_one")
    val b = batchReadings
    val joined = s.as("s").join(b.as("b"), Seq("key")).collect()
    assert(joined.length == 5)
    for (r <- joined) {
      assert(r.getAs[Long]("n") == r.getAs[Long](4), s"n mismatch: $r")
      assert(math.abs(r.getAs[Double]("max_cusum") -
        r.getAs[Double](5)) < 1e-6, s"max_cusum mismatch: $r")
      assert(math.abs(r.getAs[Double]("final_cusum") -
        r.getAs[Double](6)) < 1e-6, s"final_cusum mismatch: $r")
    }
  }

  test("state carries exactly across a time-split micro-batch boundary") {
    val d = java.nio.file.Files.createTempDirectory("graft_cusum_2")
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
    val q = StreamingCusum.monitor(stream, "event_type", "value", mu)
      .writeStream.outputMode("append")
      .format("memory").queryName("cusum_two").start()
    try q.processAllAvailable() finally q.stop()
    val s = latestPerKey("cusum_two")
    val b = batchReadings
    val joined = s.as("s").join(b.as("b"), Seq("key")).collect()
    assert(joined.length == 5)
    for (r <- joined) {
      assert(r.getAs[Long]("n") == r.getAs[Long](4))
      assert(math.abs(r.getAs[Double]("max_cusum") -
        r.getAs[Double](5)) < 1e-6,
        s"split-batch max_cusum diverged: $r")
      assert(math.abs(r.getAs[Double]("final_cusum") -
        r.getAs[Double](6)) < 1e-6)
    }
  }
}
