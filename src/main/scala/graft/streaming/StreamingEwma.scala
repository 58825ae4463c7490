package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental EWMA control chart (streaming twin of the batch
  * q320_ewma_chart statistic, with the control-chart setup: the
  * baseline mean mu and process sigma are FIXED chart parameters —
  * the full-series estimates a batch chart can derive do not exist
  * mid-stream).
  *
  * Per key the state is two doubles + a count: the EWMA statistic
  * z_t = lambda x_t + (1-lambda) z_{t-1} (seeded at mu) and the
  * time-varying-limit band term w_t = (1-lambda)^{2t}, carried as a
  * pure multiplication chain (w' = w * (1-lambda)^2) exactly like the
  * batch fold — O(1) per key. Each micro-batch folds its (event-time
  * -ordered) rows into the carried state and emits one reading per
  * key: z, the time-varying UCL/LCL
  * mu +/- L sigma sqrt(lambda/(2-lambda) (1 - w_t)), and the
  * out-of-control flag.
  *
  * ORDERING CONTRACT (same as [[StreamingCusum]]): rows are
  * event-time-sorted WITHIN each micro-batch; the fold is
  * order-sensitive and state carries no reorder buffer, so the
  * detector equals the batch fold over the same rows only when
  * arrival order respects event time across micro-batch boundaries.
  * For out-of-order transports, front the monitor with a watermark +
  * window reorder stage before folding.
  */
object StreamingEwma {

  case class EwEv(key: String, ts: Timestamp, event_id: Long, value: Double)
  case class EwState(n: Long, z: Double, w: Double)
  case class EwOut(
      key: String, n: Long, z: Double, ucl: Double, lcl: Double,
      outf: Boolean)

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000

  /** Monitor `valueCol` per `keyCol` against chart parameters
    * (`mu`, `sigma`) with smoothing `lambda` and width `l`. */
  def monitor(raw: DataFrame, keyCol: String, valueCol: String,
      mu: Double, sigma: Double, lambda: Double = 0.2,
      l: Double = 3.0): Dataset[EwOut] = {
    val spark = raw.sparkSession
    import spark.implicits._
    val om = 1.0 - lambda
    raw.select(col(keyCol).cast("string").as("key"), col("ts"),
        col("event_id").cast("long").as("event_id"),
        col(valueCol).cast("double").as("value"))
      .as[EwEv]
      .groupByKey(_.key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[EwEv], state: GroupState[EwState]) =>
          val sorted = it.toIndexedSeq
            .sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.getOrElse(EwState(0L, mu, 1.0))
          for (e <- sorted) {
            st = EwState(st.n + 1,
              lambda * e.value + om * st.z, st.w * om * om)
          }
          if (sorted.nonEmpty) state.update(st)
          val hw = l * sigma *
            math.sqrt(lambda / (2.0 - lambda) * (1.0 - st.w))
          Iterator.single(EwOut(key, st.n, st.z, mu + hw, mu - hw,
            st.z > mu + hw || st.z < mu - hw))
      }
  }
}
