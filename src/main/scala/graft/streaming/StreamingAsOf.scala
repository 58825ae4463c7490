package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event of the as-of-joined stream; side 0 = ref, 1 = probe
  * (refs sort first at equal timestamps: at-or-before includes ==). */
case class AsOfInEvent(
    user_id: Long, ts: Timestamp, side: Int, event_id: Long, value: Double)

/** Per-key carried state: the latest ref row seen so far. */
case class AsOfKeyState(tsMillis: Long, event_id: Long, value: Double)

/** One emitted probe row with its as-of ref payload (None = no ref yet). */
case class StreamAsOfOut(
    user_id: Long, event_id: Long, ts: Timestamp,
    ref_event_id: Option[Long], ref_value: Option[Double])

/** Streaming ALIGN / as-of join — the incremental twin of
  * graft.plans.AsOfJoinExec (reference: sclera's Align over unbounded
  * ordered streams, RelOp.scala:700).
  *
  * Each probe event is joined to the latest ref event of the same key
  * at-or-before its timestamp. State per key is ONE ref row (the
  * latest) — O(1), unlike a stream-stream interval join's buffered
  * window — because the as-of contract only ever needs the most recent
  * ref once events arrive per-key time-ordered. Within a micro-batch,
  * rows are processed in (ts, side, event_id) order; cross-batch order
  * is the stream's arrival discipline, exactly as in the reference's
  * ordered-stream model (and StreamingMatch here).
  *
  * StreamingAsOfSpec cross-checks the streamed output against the
  * batch AsOfJoinExec over the same events, including across
  * micro-batch boundaries.
  */
object StreamingAsOf {

  /** As-of join `probeType` events to the latest earlier `refType`
    * event per user over the events-table shape
    * (event_id, ts, user_id, event_type, value). */
  def asof(
      events: DataFrame, probeType: String, refType: String): Dataset[StreamAsOfOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col("event_type").isin(probeType, refType))
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        when(col("event_type") === refType, 0).otherwise(1).as("side"),
        col("event_id").cast("long").as("event_id"),
        col("value").cast("double").as("value"))
      .as[AsOfInEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(process)
  }

  private def process(
      key: Long, it: Iterator[AsOfInEvent],
      gs: GroupState[AsOfKeyState]): Iterator[StreamAsOfOut] = {
    var st = gs.getOption
    val out = Vector.newBuilder[StreamAsOfOut]
    for (e <- it.toVector.sortBy(r => (r.ts.getTime, r.side, r.event_id))) {
      if (e.side == 0) {
        // latest ref wins; (ts, event_id) order makes ties deterministic
        if (st.forall(s => s.tsMillis < e.ts.getTime ||
            (s.tsMillis == e.ts.getTime && s.event_id <= e.event_id)))
          st = Some(AsOfKeyState(e.ts.getTime, e.event_id, e.value))
      } else {
        val m = st.filter(_.tsMillis <= e.ts.getTime)
        out += StreamAsOfOut(key, e.event_id, e.ts,
          m.map(_.event_id), m.map(_.value))
      }
    }
    st.foreach(gs.update)
    out.result().iterator
  }
}
