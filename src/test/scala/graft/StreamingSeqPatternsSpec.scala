package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventStreams, StreamingSeqPatterns}

/** The MapState sequential-pattern twin must converge to the batch
  * q291 support table — including when the stream is split across
  * micro-batch boundaries AND the split is adversarially reordered
  * (the min/max fold is order-insensitive, unlike the CUSUM twin). */
class StreamingSeqPatternsSpec extends AnyFunSuite {
  import TestSession._

  private val rocksdb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

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

  private def assertMatchesBatch(memTable: String): Unit = {
    val streamed = StreamingSeqPatterns
      .supportsFromEmissions(spark.table(memTable))
      .collect().map(_.toString).toSeq
    val batch = graft.operators.SeqPatternOps
      .seqPatterns(Tables(spark, sfDir).events,
        "user_id", "ts", "event_type")
      .collect().map(_.toString).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("one-batch MapState summary reproduces the batch supports") {
    val d = java.nio.file.Files.createTempDirectory("graft_seqpat_1")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("events.parquet"))
    withRocksDb {
      val q = StreamingSeqPatterns.firstLast(
          EventStreams.readEvents(spark, d.toString))
        .writeStream.outputMode("update")
        .format("memory").queryName("seqpat_one").start()
      try q.processAllAvailable() finally q.stop()
    }
    assertMatchesBatch("seqpat_one")
  }

  test("REVERSED split micro-batches converge to the same supports") {
    val d = java.nio.file.Files.createTempDirectory("graft_seqpat_2")
    val ev = Tables(spark, sfDir).events.orderBy(col("ts"), col("event_id"))
    val n = ev.count()
    val firstHalf = ev.limit((n / 2).toInt)
    val secondHalf = ev.exceptAll(firstHalf)
    // adversarial arrival: the LATER half arrives first
    secondHalf.coalesce(1).write.parquet(s"$d/b0")
    withRocksDb {
      val q = StreamingSeqPatterns.firstLast(
          EventStreams.readEvents(spark, s"$d/b0"))
        .writeStream.outputMode("update")
        .format("memory").queryName("seqpat_two").start()
      try {
        q.processAllAvailable()
        firstHalf.coalesce(1).write.mode("append").parquet(s"$d/b0")
        q.processAllAvailable()
      } finally q.stop()
    }
    assertMatchesBatch("seqpat_two")
  }
}
