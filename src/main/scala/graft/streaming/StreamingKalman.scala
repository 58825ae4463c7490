package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental local-level Kalman filter (streaming twin of the batch
  * q303 filter): the filtered level is maintained ONLINE per key, so a
  * feed monitor reads the denoised signal with O(1) carried state —
  * the recurrence is exactly the batch fold, it just never needs the
  * whole series.
  *
  * Per key the state is (n, level, covariance): each observation runs
  * predict (p += Q), gain (k = p / (p + R)), update
  * (l += k * (z - l); p *= 1 - k). The first observation initializes
  * l = z, p = R — the same convention as the batch query. Each
  * micro-batch folds its (event-time-ordered) rows into the carried
  * state and emits one reading per key; the latest emit per key is
  * the current filter state.
  *
  * ORDERING CONTRACT: identical to StreamingCusum — rows are
  * event-time-sorted WITHIN each micro-batch, and the fold equals the
  * batch filter over the same rows only when arrival order respects
  * event time across micro-batch boundaries (replayed logs, the file
  * source in the specs). For out-of-order transports, front with a
  * watermark + window reorder stage.
  */
object StreamingKalman {

  case class KEv(key: String, ts: Timestamp, event_id: Long, value: Double)
  case class KState(n: Long, l: Double, p: Double, gain: Double)
  case class KOut(key: String, n: Long, level: Double, p_cov: Double,
      gain: Double)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** Filter `valueCol` per `keyCol` with process noise `qNoise` and
    * measurement noise `rNoise`. */
  def filter(raw: DataFrame, keyCol: String, valueCol: String,
      qNoise: Double, rNoise: Double): Dataset[KOut] = {
    val spark = raw.sparkSession
    import spark.implicits._
    raw.select(col(keyCol).cast("string").as("key"), col("ts"),
        col("event_id").cast("long").as("event_id"),
        col(valueCol).cast("double").as("value"))
      .as[KEv]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[KEv], state: GroupState[KState]) =>
          val sorted = it.toIndexedSeq
            .sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(KState(0L, 0.0, 0.0, 0.0))
          for (e <- sorted) {
            st =
              if (st.n == 0L) KState(1L, e.value, rNoise, 0.0)
              else {
                val pp = st.p + qNoise
                val k = pp / (pp + rNoise)
                KState(st.n + 1, st.l + k * (e.value - st.l),
                  (1.0 - k) * pp, k)
              }
          }
          if (sorted.nonEmpty) state.update(st)
          Iterator.single(KOut(key, st.n, st.l, st.p, st.gain))
      }
  }
}
