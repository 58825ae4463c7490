package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.plans.{ThetaBuffer, ThetaSketch}

/** Streaming audience reach: the same theta/KMV sketch as the batch
  * graft_theta aggregate (plans/ThetaSketch.scala), maintained
  * incrementally per segment under mapGroupsWithState. Each
  * micro-batch folds its keys into the segment's k-bounded state and
  * emits the segment's current reach estimate plus the serialized
  * sketch — so a downstream consumer can run the SAME set algebra
  * (graft_theta_intersect / anotb) over the live sketches that
  * GRAFT REACH runs over batch ones. Update semantics, fixed state
  * per segment (<= k hashes), no unbounded distinct-key table
  * anywhere.
  *
  * In its exact regime (distinct keys per segment <= k) the emitted
  * reach equals the batch countDistinct over everything streamed so
  * far — which is what StreamingReachSpec cross-checks, including
  * across micro-batch boundaries and against the batch sketch's
  * serialized bytes.
  */
object StreamingReach {

  case class KeyRow(seg: String, key: String)
  case class ReachRow(seg: String, reach: Long, sketch: Array[Byte])
  /** Encodable snapshot of the theta buffer. */
  case class ReachState(bytes: Array[Byte])

  def keyed(df: DataFrame, segCol: String, keyCol: String)
      : Dataset[KeyRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(segCol).cast("string").as("seg"),
      col(keyCol).cast("string").as("key")).as[KeyRow]
  }

  /** Current reach per segment after each micro-batch. */
  def reach(rows: Dataset[KeyRow], k: Int): Dataset[ReachRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.seg)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (seg: String, it: Iterator[KeyRow],
         state: GroupState[ReachState]) =>
          val buf = state.getOption
            .map(s => ThetaSketch.deserialize(s.bytes))
            .getOrElse(new ThetaBuffer(k))
          it.foreach { r =>
            buf.add(org.apache.spark.sql.catalyst.expressions
              .XxHash64Function.hash(
                org.apache.spark.unsafe.types.UTF8String
                  .fromString(r.key),
                org.apache.spark.sql.types.StringType, 42L))
          }
          val bytes = ThetaSketch.serialize(buf)
          state.update(ReachState(bytes))
          ReachRow(seg,
            math.round(ThetaSketch.estimate(bytes)), bytes)
      }
  }
}
