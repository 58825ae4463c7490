package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental CUSUM drift monitor (streaming twin of the batch q229
  * change-point statistic, with the control-chart setup: deviations
  * are taken against a FIXED baseline mean — the full-series mean a
  * batch detector can use does not exist mid-stream).
  *
  * Per key the state is three doubles + a count: running deviation
  * sum S, min prefix min(0, min S), and the max drawup
  * (max_t S_t - minPrefix_t) — O(1) per key, the max-drawup
  * re-expression that makes the recursive max(0, ...) CUSUM fold
  * incremental. Each micro-batch folds its (event-time-ordered) rows
  * into the carried state and emits one summary row per key; the
  * latest emit per key is the current detector reading.
  *
  * ORDERING CONTRACT: rows are event-time-sorted WITHIN each
  * micro-batch, but the fold is order-sensitive and state carries no
  * reorder buffer — a row arriving in a LATER micro-batch with an
  * earlier event time is folded after the later events. The detector
  * therefore equals the batch fold over the same rows only when
  * arrival order respects event time across micro-batch boundaries
  * (true for replayed logs and the file source used in the specs).
  * For out-of-order transports, front the monitor with a
  * watermark + window reorder stage (accept the watermark's lateness
  * bound as the detection delay) before folding.
  */
object StreamingCusum {

  case class CuEv(key: String, ts: Timestamp, event_id: Long, value: Double)
  case class CuState(n: Long, s: Double, minPrefix: Double, maxCusum: Double)
  case class CuOut(
      key: String, n: Long, max_cusum: Double, final_cusum: Double)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** Monitor `valueCol` per `keyCol` against baseline mean `mu`. */
  def monitor(raw: DataFrame, keyCol: String, valueCol: String,
      mu: Double): Dataset[CuOut] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(col(keyCol).cast("string").as("key"), col("ts"),
        col("event_id").cast("long").as("event_id"),
        col(valueCol).cast("double").as("value"))
      .as[CuEv]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[CuEv], state: GroupState[CuState]) =>
          val sorted = it.toIndexedSeq
            .sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(CuState(0L, 0.0, 0.0, 0.0))
          for (e <- sorted) {
            val s = st.s + (e.value - mu)
            val minP = math.min(st.minPrefix, s)
            val cusum = s - minP
            st = CuState(st.n + 1, s, minP, math.max(st.maxCusum, cusum))
          }
          if (sorted.nonEmpty) state.update(st)
          Iterator.single(
            CuOut(key, st.n, st.maxCusum, st.s - st.minPrefix))
      }
  }
}
