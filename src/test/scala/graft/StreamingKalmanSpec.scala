package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, StreamingKalman}

/** The incremental Kalman filter must equal an independent local fold
  * of the same recurrence over the event-time-ordered series —
  * including when the stream is split across micro-batch boundaries
  * (the O(1) carried (n, level, covariance) state is the point). */
class StreamingKalmanSpec extends AnyFunSuite {
  import TestSession._

  private val Q = 2.0
  private val R = 10.0

  /** Independent reference: plain Scala fold per key over the ordered
    * values (written against the filter definition, not the
    * streaming code). */
  private def reference: Map[String, (Long, Double, Double)] = {
    Tables(spark, sfDir).events
      .select(col("event_type"), col("ts"), col("event_id"),
        col("value").cast("double"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        val vs = rows.sortBy(r =>
          (r.getTimestamp(1).getTime, r.getLong(2))).map(_.getDouble(3))
        var l = vs.head
        var p = R
        for (z <- vs.tail) {
          val pp = p + Q
          val g = pp / (pp + R)
          l = l + g * (z - l)
          p = (1.0 - g) * pp
        }
        k -> (vs.length.toLong, l, p)
      }
  }

  private def latestPerKey(table: String) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("n").desc)
    spark.table(table)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("key"), col("n"), col("level"), col("p_cov"))
  }

  test("one-batch streaming Kalman equals the reference fold") {
    val d = java.nio.file.Files.createTempDirectory("graft_kalman_1")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    val q = StreamingKalman.filter(
        EventStreams.readEvents(spark, d.toString), "event_type", "value",
        Q, R)
      .writeStream.outputMode("append")
      .format("memory").queryName("kalman_one").start()
    try q.processAllAvailable() finally q.stop()
    val ref = reference
    val got = latestPerKey("kalman_one").collect()
    assert(got.length == ref.size)
    for (r <- got) {
      val (n, l, p) = ref(r.getString(0))
      assert(r.getAs[Long]("n") == n, s"n mismatch: $r")
      assert(math.abs(r.getAs[Double]("level") - l) < 1e-9,
        s"level mismatch: $r vs $l")
      assert(math.abs(r.getAs[Double]("p_cov") - p) < 1e-12,
        s"covariance mismatch: $r vs $p")
    }
  }

  test("state RECOVERS from the checkpoint across a query restart") {
    // the fault-tolerance contract: kill the query after the first
    // half, start a NEW query over the same checkpoint, and the
    // carried (n, level, covariance) state must resume exactly — the
    // final readings equal the uninterrupted reference fold.
    val d = java.nio.file.Files.createTempDirectory("graft_kalman_3")
    val ckpt = d.resolve("ckpt").toString
    val outDir = d.resolve("out").toString
    val inDir = d.resolve("in")
    java.nio.file.Files.createDirectories(inDir)
    val ev = Tables(spark, sfDir).events.orderBy(col("ts"), col("event_id"))
    val n = ev.count()
    val firstHalf = ev.limit((n / 2).toInt)
    val secondHalf = ev.exceptAll(firstHalf)
    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema(Tables(spark, sfDir).events.schema)
        .parquet(inDir.toString)
      val q = StreamingKalman.filter(stream, "event_type", "value", Q, R)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet").start(outDir)
      try q.processAllAvailable() finally q.stop()
    }
    firstHalf.coalesce(1).write.mode("append").parquet(inDir.toString)
    runOnce()
    secondHalf.coalesce(1).write.mode("append").parquet(inDir.toString)
    runOnce() // a fresh query over the same checkpoint: state restored
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("n").desc)
    val latest = spark.read.parquet(outDir)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .select(col("key"), col("n"), col("level"), col("p_cov")).collect()
    val ref = reference
    assert(latest.length == ref.size)
    for (r <- latest) {
      val (nn, l, p) = ref(r.getString(0))
      assert(r.getAs[Long]("n") == nn, s"restart lost rows: $r")
      assert(math.abs(r.getAs[Double]("level") - l) < 1e-9,
        s"restart diverged: $r vs $l")
      assert(math.abs(r.getAs[Double]("p_cov") - p) < 1e-12)
    }
  }

  test("state carries exactly across a time-split micro-batch boundary") {
    val d = java.nio.file.Files.createTempDirectory("graft_kalman_2")
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
    val q = StreamingKalman.filter(stream, "event_type", "value", Q, R)
      .writeStream.outputMode("append")
      .format("memory").queryName("kalman_two").start()
    try q.processAllAvailable() finally q.stop()
    val ref = reference
    for (r <- latestPerKey("kalman_two").collect()) {
      val (nn, l, p) = ref(r.getString(0))
      assert(r.getAs[Long]("n") == nn)
      assert(math.abs(r.getAs[Double]("level") - l) < 1e-9,
        s"split-batch level diverged: $r vs $l")
      assert(math.abs(r.getAs[Double]("p_cov") - p) < 1e-12)
    }
  }
}
