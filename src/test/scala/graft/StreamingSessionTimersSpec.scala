package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, StreamingSessionTimers}

/** Timer-based sessionization must emit exactly the batch 30-min-gap
  * sessions: in-stream closes (superseded by a later event) plus
  * watermark-timer closes (the tail session of every user) — each
  * exactly once. The watermark only advances on a FOLLOWING batch, so
  * the spec pushes two sentinel batches to flush the tail timers. */
class StreamingSessionTimersSpec extends AnyFunSuite {
  import TestSession._

  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val sentinelUser = 999999L

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

  private def batchSessions = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables(spark, sfDir).events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("brk",
        when(col("prev").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev").cast("timestamp")) > 1800000000L,
          1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(w))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
  }

  test("timer sessionization equals batch gap sessions, each once") {
    val d = java.nio.file.Files.createTempDirectory("graft_sesstimer")
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"), col("ts"))
      .orderBy(col("ts"), col("user_id"))
    val n = ev.count()
    val firstHalf = ev.limit((n / 2).toInt)
    val secondHalf = ev.exceptAll(firstHalf)
    firstHalf.coalesce(1).write.parquet(s"$d/b0")

    def sentinel(offsetDays: Int) = {
      import spark.implicits._
      val maxTs = Tables(spark, sfDir).events
        .agg(max(col("ts"))).collect()(0).getTimestamp(0)
      Seq((sentinelUser,
          new java.sql.Timestamp(
            maxTs.getTime + offsetDays * 86400000L)))
        .toDF("user_id", "ts")
        .select(col("user_id"), col("ts").cast("timestamp_ntz").as("ts"))
    }

    withRocksDb {
      val q = StreamingSessionTimers.sessions(
          EventStreams.readEvents(spark, s"$d/b0"), gapMinutes = 30)
        .writeStream.outputMode("append")
        .format("memory").queryName("sess_timer").start()
      try {
        q.processAllAvailable()
        secondHalf.coalesce(1).write.mode("append").parquet(s"$d/b0")
        q.processAllAvailable()
        // two sentinel batches: the first advances max event time,
        // the second runs with the advanced watermark -> timers fire
        sentinel(10).coalesce(1).write.mode("append").parquet(s"$d/b0")
        q.processAllAvailable()
        sentinel(20).coalesce(1).write.mode("append").parquet(s"$d/b0")
        q.processAllAvailable()
      } finally q.stop()
    }

    val streamed = spark.table("sess_timer")
      .where(col("user_id") =!= sentinelUser)
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .collect().map(_.toString).sorted.toSeq
    val batch = batchSessions.collect().map(_.toString).sorted.toSeq
    assert(streamed.nonEmpty)
    assert(streamed.size == batch.size,
      s"streamed ${streamed.size} vs batch ${batch.size}")
    assert(streamed == batch)
  }
}
