package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental Markov transition maintenance (streaming twin of the
  * batch q210 transition matrix): per-user state is ONLY the last seen
  * event — each micro-batch emits the boundary transition (state ->
  * first row) plus the within-batch successor pairs, then keeps the
  * new last event. After the stream drains, the emitted transitions
  * aggregate to exactly the batch window derivation
  * (StreamingMarkovSpec cross-checks both the one-batch and the
  * split-batch drive).
  *
  * At scale: O(1) state per user (contrast buffering the run), and the
  * transition matrix itself is the downstream 5x5 aggregate.
  */
object StreamingMarkov {

  case class MkEv(
      user_id: Long, ts: Timestamp, event_id: Long, event_type: String)
  case class MkLast(tsMicros: Long, eventId: Long, eventType: String)
  case class MkTrans(user_id: Long, from_type: String, to_type: String)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  def transitions(raw: DataFrame): Dataset[MkTrans] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"), col("event_type"))
      .as[MkEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[MkEv], state: GroupState[MkLast]) =>
          val sorted = it.toIndexedSeq
            .sortBy(e => (micros(e.ts), e.event_id))
          val types: Seq[String] = state.getOption match {
            case Some(last) => last.eventType +: sorted.map(_.event_type)
            case None => sorted.map(_.event_type)
          }
          if (sorted.nonEmpty) {
            val l = sorted.last
            state.update(MkLast(micros(l.ts), l.event_id, l.event_type))
          }
          types.sliding(2).collect {
            case Seq(a, b) => MkTrans(uid, a, b)
          }
      }
  }
}
