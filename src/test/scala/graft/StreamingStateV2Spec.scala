package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, StreamingStateV2}

/** The transformWithState running aggregate (Spark 4 arbitrary-state
  * API over RocksDB) must equal the batch groupBy twin — including the
  * trailing-k window when the stream is split across micro-batch
  * boundaries, which exercises the ValueState AND ListState carries. */
class StreamingStateV2Spec extends AnyFunSuite {
  import TestSession._

  private val K = 5
  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Batch twin: total aggregates + trailing-K sum per event_type. */
  private def batchReadings = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-(K - 1), Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables(spark, sfDir).events
      .withColumn("trail_sum", sum(col("value")).over(w))
      .withColumn("trail_n", count(lit(1)).over(w).cast("int"))
      .withColumn("rn", row_number().over(wAll))
      .groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"),
        max(col("value")).as("vmax"),
        max_by(col("trail_sum"), col("rn")).as("trail_sum"),
        max_by(col("trail_n"), col("rn")).as("trail_n"))
  }

  private def latestPerKey(table: String) = {
    val w = Window.partitionBy(col("key")).orderBy(col("n").desc)
    spark.table(table)
      .withColumn("rk", row_number().over(w))
      .where(col("rk") === 1)
      .drop("rk")
  }

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, rocksdb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def assertMatches(streamTable: String): Unit = {
    val joined = latestPerKey(streamTable).as("s")
      .join(batchReadings.as("b"), Seq("key"))
      .select(col("key"),
        col("s.n"), col("b.n"),
        col("s.total"), col("b.total"),
        col("s.vmax"), col("b.vmax"),
        col("s.trail_n"), col("b.trail_n"),
        col("s.trail_sum"), col("b.trail_sum"))
      .collect()
    assert(joined.length == 5)
    for (r <- joined) {
      assert(r.getLong(1) == r.getLong(2), s"n mismatch: $r")
      assert(math.abs(r.getDouble(3) - r.getDouble(4)) < 1e-6, s"total: $r")
      assert(math.abs(r.getDouble(5) - r.getDouble(6)) < 1e-6, s"vmax: $r")
      assert(r.getInt(7) == r.getInt(8), s"trail_n mismatch: $r")
      assert(math.abs(r.getDouble(9) - r.getDouble(10)) < 1e-6,
        s"trail_sum mismatch: $r")
    }
  }

  test("one-batch transformWithState equals the batch twin") {
    val d = java.nio.file.Files.createTempDirectory("graft_tws_1")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    withRocksDb {
      val q = StreamingStateV2.runningAgg(
          EventStreams.readEvents(spark, d.toString), "event_type", "value", K)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_one").start()
      try q.processAllAvailable() finally q.stop()
    }
    assertMatches("tws_one")
  }

  test("ValueState and ListState carry across a micro-batch boundary") {
    val d = java.nio.file.Files.createTempDirectory("graft_tws_2")
    val ev = Tables(spark, sfDir).events.orderBy(col("ts"), col("event_id"))
    val n = ev.count()
    val firstHalf = ev.limit((n / 2).toInt)
    val secondHalf = ev.exceptAll(firstHalf)
    firstHalf.coalesce(1).write.parquet(s"$d/b0")
    withRocksDb {
      val q = StreamingStateV2.runningAgg(
          EventStreams.readEvents(spark, s"$d/b0"), "event_type", "value", K)
        .writeStream.outputMode("update")
        .format("memory").queryName("tws_two").start()
      try {
        q.processAllAvailable()
        secondHalf.coalesce(1).write.mode("append").parquet(s"$d/b0")
        q.processAllAvailable()
      } finally q.stop()
    }
    assertMatches("tws_two")
  }
}
