package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Watermark semantics under late data — the production contract a
  * 100-TB streaming pipeline depends on: rows later than the
  * watermark are DROPPED from stateful aggregation (not silently
  * absorbed, not crashing), and the drop is observable in the query
  * progress metrics (numRowsDroppedByWatermark), which is where a
  * real pipeline alarms on late-data loss. */
class WatermarkLateDataSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("late rows are dropped from the windowed agg and counted") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, Long)]
    def ts(min: Int) = new java.sql.Timestamp(min * 60000L)
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(sum(col("v")).as("s"))
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("wm_out").start()
    try {
      // batch 1: events at minute 5 and 65 -> watermark advances to 55
      input.addData((ts(5), 1L), (ts(65), 10L))
      q.processAllAvailable()
      // batch 2: a LATE event at minute 20 (< watermark 55): dropped
      input.addData((ts(20), 100L))
      q.processAllAvailable()
      // batch 3: an on-time event joins its window
      input.addData((ts(66), 20L))
      q.processAllAvailable()
      val out = spark.table("wm_out")
        .select(col("window.start").cast("long").as("w"), col("s"))
        .collect().groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).max).toMap
      // the [0,10) window never saw the late +100
      assert(out(0L) == 1L, s"late row leaked into the window: $out")
      assert(out(3600L) == 30L)
      val dropped = q.recentProgress
        .flatMap(p => Option(p.stateOperators).toSeq.flatMap(_.toSeq))
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped >= 1, "late-data drop must surface in metrics")
    } finally q.stop()
  }
}
