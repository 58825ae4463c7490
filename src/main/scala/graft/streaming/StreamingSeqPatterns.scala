package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Incremental sequential-pattern summary (streaming twin of q291 /
  * SeqPatternOps) on the Spark 4 transformWithState API, showcasing
  * the MAP-typed state handle: per user the state is exactly the
  * bounded per-label (first_ts, last_ts) summary the batch operator
  * collapses to — at most |labels| entries per key, each read/written
  * individually (a MapState point-lookup per input row, never a
  * deserialize-the-whole-blob like a flatMapGroupsWithState case
  * class would force).
  *
  * The fold is min/max only, so unlike the CUSUM/trailing-window
  * twins it is ORDER-INSENSITIVE: late or out-of-order arrivals fold
  * to the same summary, and the emitted spans converge to the batch
  * summary under any micro-batching.
  *
  * Each batch emits the touched user's full current summary
  * (<= |labels| rows); the latest emission per (user, label) feeds
  * SeqPatternOps.supportsFromSummary to produce the same support
  * table as the batch operator.
  */
object StreamingSeqPatterns {

  case class Ev(user_id: Long, ts: Timestamp, event_type: String)
  case class Span(f: Timestamp, l: Timestamp)
  case class FlOut(user_id: Long, event_type: String,
      f: Timestamp, l: Timestamp)

  class FirstLast extends StatefulProcessor[Long, Ev, FlOut] {
    @transient private var fl: MapState[String, Span] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      fl = getHandle.getMapState[String, Span](
        "fl", Encoders.STRING, Encoders.product[Span], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[FlOut] = {
      for (e <- rows) {
        val next =
          if (fl.containsKey(e.event_type)) {
            val cur = fl.getValue(e.event_type)
            Span(if (e.ts.before(cur.f)) e.ts else cur.f,
              if (e.ts.after(cur.l)) e.ts else cur.l)
          } else Span(e.ts, e.ts)
        fl.updateValue(e.event_type, next)
      }
      fl.iterator().map { case (lbl, s) => FlOut(user, lbl, s.f, s.l) }
    }
  }

  /** Per-(user, label) first/last span stream; requires the RocksDB
    * state store provider (the only one transformWithState runs on). */
  def firstLast(raw: DataFrame): Dataset[FlOut] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_type"))
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(
        new FirstLast, TimeMode.None(), OutputMode.Update())
  }

  /** Collapse accumulated emissions (one per touched user per batch)
    * to the final summary and compute the support table — the
    * min/max collapse absorbs the replay duplicates. */
  def supportsFromEmissions(emitted: DataFrame): DataFrame =
    graft.operators.SeqPatternOps.supportsFromSummary(
      emitted.groupBy(col("user_id").as("k"),
          col("event_type").as("lbl"))
        .agg(min(col("f")).as("f"), max(col("l")).as("l")))
}
