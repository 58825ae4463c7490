package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.PlotOps

/** Streaming / animated plot display (reference: modules/visual
  * model/plot/Transition.scala — sclera re-renders a plot as the
  * underlying streaming query emits; the repo's web display was
  * static SVG per request until now).
  *
  * The Spark shape: ONE streaming aggregate in complete mode keyed
  * (series, bin) — the same bounded |series| x |bins| planning frame
  * `PlotOps.binSeries` produces for batch PLOT — re-rendered per
  * micro-batch inside foreachBatch. Each frame is a full deterministic
  * SVG of the aggregate's CURRENT state, so the animation is a
  * sequence of complete pictures (no diffing protocol), the final
  * frame equals the batch render over everything streamed, and the
  * per-batch work is bounded by the frame size, never the input.
  *
  * Frames land in an in-process registry (latest + bounded history)
  * keyed by a caller-chosen display name — the hook a display surface
  * polls (the HTTP display can serve `latest(name)` per request).
  */
object StreamingPlot {

  /** Bounded per-display frame history. */
  final class Display(val maxFrames: Int) {
    private val buf = ArrayBuffer.empty[(Long, String)]
    def push(batchId: Long, svg: String): Unit = synchronized {
      buf += ((batchId, svg))
      if (buf.length > maxFrames) buf.remove(0, buf.length - maxFrames)
    }
    def frames: Seq[(Long, String)] = synchronized(buf.toSeq)
    def latest: Option[String] = synchronized(buf.lastOption.map(_._2))
  }

  private val displays = new ConcurrentHashMap[String, Display]()
  private val runId = new AtomicLong(0L)

  def display(name: String): Option[Display] =
    Option(displays.get(name))

  /** Start the animated plot over an events STREAM: per event-time
    * hour-of-day bin and `seriesCol` series, a running count — then a
    * fresh SVG per micro-batch. Returns the query and the display
    * name to poll.
    *
    * The x axis is the 24-slot hour grid (a FIXED domain, like a
    * batch PLOT with FROM/TO — comparable frames across batches by
    * construction); complete output mode re-emits the whole bounded
    * frame each batch, which is exactly what a full re-render needs.
    */
  def hourlyCounts(events: DataFrame, seriesCol: String,
      name: String = s"plot_${runId.incrementAndGet()}",
      maxFrames: Int = 64): (StreamingQuery, String) = {
    val d = new Display(maxFrames)
    displays.put(name, d)
    val agg = events
      .groupBy(col(seriesCol).cast("string").as("series"),
        hour(col("ts")).as("bin"))
      .agg(count(lit(1)).cast("double").as("y"))
    val q = agg.writeStream.outputMode("complete")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the frame is |series| x 24 rows — bounded by construction
        val frame = batch
          .withColumn("bin_lo", col("bin").cast("double"))
          .withColumn("bin_hi", col("bin").cast("double") + 1.0)
          .select("series", "bin", "bin_lo", "bin_hi", "y")
        if (!frame.isEmpty)
          d.push(batchId,
            PlotOps.renderSvg(frame, s"events by hour (batch $batchId)"))
      }
      .queryName(name).start()
    (q, name)
  }
}
