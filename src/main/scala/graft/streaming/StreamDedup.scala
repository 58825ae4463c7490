package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact-dedup: keep the first document per canonical key,
  * with per-key state in the state store (flatMapGroupsWithState).
  *
  * State is one boolean per canonical key — at 100 TB the state store
  * shards by key across executors; keys can be expired with a timeout
  * where the dedup horizon is bounded.
  */
object StreamDedup {

  case class Keyed(canon_key: String, doc_id: Long)
  case class Kept(canon_key: String, doc_id: Long)

  /** Canonical key: md5 of the sorted distinct token set — identical
    * to the batch q48 canonicalization. */
  def withCanonKey(docs: DataFrame): Dataset[Keyed] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      md5(array_join(array_sort(array_distinct(split(col("text"), "\\s+"))),
        " ")).as("canon_key"),
      col("doc_id"))
      .as[Keyed]
  }

  /** Emit only the first doc seen per canonical key. */
  def dedup(keyed: Dataset[Keyed]): Dataset[Kept] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .groupByKey(_.canon_key)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Keyed], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // within a micro-batch, keep the lowest doc_id
            val first = rows.minBy(_.doc_id)
            Iterator(Kept(key, first.doc_id))
          }
      }
  }
}
