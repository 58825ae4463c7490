package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental naive Bayes model maintenance (streaming twin of the
  * batch q126 classifier): per-label feature-value counts held under
  * mapGroupsWithState, folded micro-batch by micro-batch. State per
  * label is the label total plus one count per observed feature value
  * — the same tiny model the batch trainer aggregates, so after the
  * stream drains, the state equals the batch counts exactly (what
  * StreamingNaiveBayesSpec cross-checks).
  *
  * At scale: grouping is per label (a handful of groups), each holding
  * a bounded |feature vocabulary| map — state does not grow with the
  * stream. Scoring joins this model exactly like the batch path.
  */
object StreamingNaiveBayes {

  case class Obs(label: String, f1: Long, f2: Long)
  case class ModelRow(
      label: String, n_l: Long, feature: String, value: Long, n: Long)
  case class NbState(
      nL: Long, f1Counts: Map[Long, Long], f2Counts: Map[Long, Long])

  def observations(events: DataFrame): Dataset[Obs] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
      col("event_type").as("label"),
      hour(col("ts")).cast("long").as("f1"),
      floor(col("value") / lit(50.0)).cast("long").as("f2")).as[Obs]
  }

  /** Emits the label's full current model after each micro-batch. */
  def model(obs: Dataset[Obs]): Dataset[ModelRow] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.label)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (label: String, it: Iterator[Obs], state: GroupState[NbState]) =>
          var s = state.getOption.getOrElse(
            NbState(0L, Map.empty, Map.empty))
          it.foreach { o =>
            s = NbState(
              s.nL + 1,
              s.f1Counts.updated(o.f1, s.f1Counts.getOrElse(o.f1, 0L) + 1),
              s.f2Counts.updated(o.f2, s.f2Counts.getOrElse(o.f2, 0L) + 1))
          }
          state.update(s)
          (s.f1Counts.iterator.map { case (v, n) =>
            ModelRow(label, s.nL, "f1", v, n) } ++
           s.f2Counts.iterator.map { case (v, n) =>
            ModelRow(label, s.nL, "f2", v, n) })
      }
  }
}
