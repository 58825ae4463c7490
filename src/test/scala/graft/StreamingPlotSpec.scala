package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PlotOps
import graft.streaming.StreamingPlot

/** Animated plot display: a fresh SVG frame per micro-batch over the
  * streaming hourly-count aggregate; the final frame must equal the
  * batch render of the same frame over everything streamed. */
class StreamingPlotSpec extends AnyFunSuite {
  import TestSession._

  private def batchSvg(title: String): String = {
    val frame = Tables(spark, sfDir).events
      .groupBy(col("event_type").cast("string").as("series"),
        hour(col("ts")).as("bin"))
      .agg(count(lit(1)).cast("double").as("y"))
      .withColumn("bin_lo", col("bin").cast("double"))
      .withColumn("bin_hi", col("bin").cast("double") + 1.0)
      .select("series", "bin", "bin_lo", "bin_hi", "y")
    PlotOps.renderSvg(frame, title)
  }

  test("per-micro-batch frames animate; final frame == batch render") {
    val d = java.nio.file.Files.createTempDirectory("graft_splot")
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
    val (q, name) = StreamingPlot.hourlyCounts(stream, "event_type")
    try q.processAllAvailable() finally q.stop()
    val frames = StreamingPlot.display(name).get.frames
    // one frame per micro-batch, batch ids in order
    assert(frames.length >= 2, s"expected >=2 frames, got $frames")
    assert(frames.map(_._1) == frames.map(_._1).sorted)
    // the picture actually changed between batches (animation)
    assert(frames.map(_._2).distinct.length >= 2)
    // every frame is a complete well-formed SVG
    for ((_, svg) <- frames)
      assert(svg.startsWith("<svg ") && svg.endsWith("</svg>"))
    // final frame == the batch render of the full corpus
    val lastId = frames.last._1
    assert(frames.last._2 ==
      batchSvg(s"events by hour (batch $lastId)"))
  }

  test("display registry caps history and serves the latest frame") {
    val disp = new StreamingPlot.Display(maxFrames = 3)
    for (i <- 0 until 10) disp.push(i.toLong, s"<svg $i/>")
    assert(disp.frames.map(_._1) == Seq(7L, 8L, 9L))
    assert(disp.latest.contains("<svg 9/>"))
  }
}
