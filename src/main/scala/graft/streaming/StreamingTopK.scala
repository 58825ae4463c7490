package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.plans.TopKBuffer

/** Streaming heavy hitters: the same SpaceSaving summary as the batch
  * graft_topk aggregate (plans/SpaceSavingTopK.scala), maintained
  * incrementally per group under mapGroupsWithState. Each micro-batch
  * folds its rows into the group's capacity-bounded state and emits
  * the group's current top-k — update semantics, fixed state per group
  * (capacity entries), no unbounded distinct-term table anywhere.
  *
  * In its exact regime (capacity >= distinct terms per group) the
  * emitted counts equal the batch aggregate over everything streamed
  * so far — which is what StreamingTopKSpec cross-checks, including
  * across micro-batch boundaries.
  */
object StreamingTopK {

  case class TermRow(group: String, term: String)
  case class TopEntry(group: String, term: String, n: Long)
  /** Encodable snapshot of the SpaceSaving summary. */
  case class TopKState(
      terms: Array[String], counts: Array[Long], errs: Array[Long])

  def keyed(df: DataFrame, groupCol: String, termCol: String)
      : Dataset[TermRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(groupCol).cast("string").as("group"),
      col(termCol).cast("string").as("term")).as[TermRow]
  }

  /** Current top-k per group after each micro-batch. */
  def topK(rows: Dataset[TermRow], k: Int, capacity: Int)
      : Dataset[TopEntry] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .groupByKey(_.group)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (group: String, it: Iterator[TermRow],
         state: GroupState[TopKState]) =>
          val buf = new TopKBuffer(capacity)
          state.getOption.foreach { s =>
            var i = 0
            while (i < s.terms.length) {
              buf.counts.update(s.terms(i), (s.counts(i), s.errs(i)))
              i += 1
            }
          }
          it.foreach(r => buf.add(r.term, 1L, 0L))
          val entries = buf.counts.toSeq
          state.update(TopKState(
            entries.map(_._1).toArray,
            entries.map(_._2._1).toArray,
            entries.map(_._2._2).toArray))
          buf.counts.toSeq
            .sortBy { case (t, (c, _)) => (-c, t) }
            .take(k)
            .map { case (t, (c, _)) => TopEntry(group, t, c) }
            .iterator
      }
  }
}
