package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Gap-based sessionization with EVENT-TIME TIMERS on the Spark 4
  * transformWithState API — the third leg of graft's coverage of the
  * new arbitrary-state runtime (StreamingStateV2 = Value/ListState,
  * StreamingSeqPatterns = MapState, here = TimeMode.EventTime +
  * registerTimer/handleExpiredTimer).
  *
  * Why timers matter at scale: the built-in session_window closes a
  * session only when an aggregation output fires; a custom processor
  * with a timer closes it the moment the WATERMARK passes
  * session_end + gap — no per-key polling, no full state sweep. The
  * state store indexes timers by timestamp, so each micro-batch
  * touches exactly the keys whose sessions just expired — O(expired),
  * not O(keys), the property that keeps a 100M-key session store
  * responsive.
  *
  * Per key the state is ONE open session (start, end, n). Rows extend
  * it (same 30-min gap discipline as q47/q151) or close it and open a
  * new one; the registered timer is re-armed to end + gap on every
  * extension. Sessions close two ways — superseded by a later event
  * in-stream, or expired by the watermark timer — and each closed
  * session is emitted exactly once.
  *
  * ORDERING CONTRACT: same as StreamingCusum — rows sort by event
  * time within a batch; arrival order must respect event time across
  * batches (a replayed log / file source), else a late row would
  * extend an already-emitted session.
  */
object StreamingSessionTimers {

  case class Ev(user_id: Long, ts: Timestamp)
  case class Sess(startUs: Long, endUs: Long, n: Long)
  case class SessOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  class Sessionizer(gapUs: Long) extends StatefulProcessor[Long, Ev, SessOut] {
    @transient private var open: ValueState[Sess] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Sess](
        "open", Encoders.product[Sess], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[SessOut] = {
      val sorted = rows.map(e => micros(e.ts)).toIndexedSeq.sorted
      var closed = List.empty[SessOut]
      var cur = if (open.exists()) Option(open.get()) else None
      for (us <- sorted) cur match {
        case Some(s) if us - s.endUs <= gapUs =>
          cur = Some(Sess(s.startUs, math.max(s.endUs, us), s.n + 1))
        case Some(s) =>
          closed ::= SessOut(user, toTs(s.startUs), toTs(s.endUs), s.n)
          cur = Some(Sess(us, us, 1L))
        case None =>
          cur = Some(Sess(us, us, 1L))
      }
      cur.foreach { s =>
        open.update(s)
        // re-arm: one pending timer per key at end + gap (event time)
        getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(s.endUs / 1000L + gapUs / 1000L)
      }
      closed.reverseIterator
    }

    override def handleExpiredTimer(user: Long,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessOut] = {
      if (open.exists()) {
        val s = open.get()
        open.clear()
        Iterator.single(
          SessOut(user, toTs(s.startUs), toTs(s.endUs), s.n))
      } else Iterator.empty
    }
  }

  /** 30-minute-gap sessions over the events stream; requires a
    * watermark on `ts` (timers fire off the watermark) and the
    * RocksDB state store provider. */
  def sessions(raw: DataFrame, gapMinutes: Int = 30): Dataset[SessOut] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 second")
      .as[Ev]
      .groupByKey(_.user_id)
      .transformWithState(new Sessionizer(gapMinutes * 60L * 1000000L),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
