package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.SeqMatchOp

/** One event of the matched stream. */
case class MatchEvent(
    user_id: Long, ts: Timestamp, event_id: Long, event_type: String)

/** A buffered row of the in-flight run (ordinal kept as micros so the
  * state is a flat, efficiently-encoded product type). */
case class MatchRunRow(ordMicros: Long, label: String)

/** Keyed matcher state carried between micro-batches: the NFA state
  * set, the buffered candidate run, and the per-key match counter —
  * O(pattern + current run) per key, independent of stream length. */
case class MatchKeyState(
    states: Seq[Int], run: Seq[MatchRunRow], matchId: Long)

/** One emitted match. */
case class StreamMatchOut(
    user_id: Long, match_id: Long, n_rows: Int,
    first_ord: Timestamp, last_ord: Timestamp, path: String)

/** Streaming row-sequence regex MATCH — the incremental twin of
  * graft.operators.SeqMatchOp (reference: analytics/sequence/matcher —
  * sclera evaluates the matcher over unbounded ordered streams; here
  * the same Thompson-NFA discipline runs under
  * flatMapGroupsWithState).
  *
  * Semantics are identical to the batch operator (leftmost,
  * non-overlapping, shortest): a match emits as soon as the automaton
  * accepts and scanning restarts. Events are processed in (ts,
  * event_id) order within each micro-batch; cross-batch order is the
  * stream's arrival discipline (file/kafka sources deliver per-key
  * appends in order — reordering across batches is the source's
  * contract, as in the reference).
  *
  * StreamingMatchSpec cross-checks: one-batch streaming output ==
  * SeqMatchOp.matchPattern over the same events.
  */
object StreamingMatch {

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  private def toTs(m: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(m, 1000000L) * 1000)
    t.setNanos((Math.floorMod(m, 1000000L) * 1000).toInt)
    t
  }

  def matches(events: DataFrame, pattern: String): Dataset[StreamMatchOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_id").cast("long").as("event_id"), col("event_type"))
      .as[MatchEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(process(pattern))
  }

  private def process(pattern: String)(
      key: Long, it: Iterator[MatchEvent],
      gs: GroupState[MatchKeyState]): Iterator[StreamMatchOut] = {
    val nfa = SeqMatchOp.compile(pattern)
    val st0 = gs.getOption.getOrElse(
      MatchKeyState(nfa.initial.toSeq.sorted, Nil, 0L))
    var states = st0.states.toSet
    var run = st0.run.toVector
    var matchId = st0.matchId
    val out = Vector.newBuilder[StreamMatchOut]

    def restart(): Unit = { states = nfa.initial; run = Vector.empty }
    def emit(): Unit = {
      matchId += 1
      out += StreamMatchOut(
        key, matchId, run.length,
        toTs(run.head.ordMicros), toTs(run.last.ordMicros),
        run.map(_.label).mkString("->"))
    }

    val ordered = it.toVector.sortBy(e => (micros(e.ts), e.event_id))
    for (e <- ordered) {
      val label = e.event_type
      val nxt = nfa.step(states, label)
      if (nxt.isEmpty) {
        // dead: drop the current run, retry this row as a fresh start
        restart()
        val retry = nfa.step(states, label)
        if (retry.nonEmpty) {
          states = retry; run :+= MatchRunRow(micros(e.ts), label)
        }
      } else {
        states = nxt; run :+= MatchRunRow(micros(e.ts), label)
      }
      if (nfa.accepts(states)) { emit(); restart() }
    }

    gs.update(MatchKeyState(states.toSeq.sorted, run.toList, matchId))
    out.result().iterator
  }
}
