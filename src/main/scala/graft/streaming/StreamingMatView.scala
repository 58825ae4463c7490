package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.MatViewOps

/** Streaming materialized-view maintenance (the streaming twin of
  * MatViewOps, shaped like StreamingIndexer): new fact files landing
  * under `factPath` are drained with Trigger.AvailableNow and each
  * micro-batch folds ONE partial aggregate into the view — the view
  * is key-bounded state extended forever, never recomputed from
  * history. The scheduler-run shape for a growing 100-TB fact: every
  * invocation processes only files that arrived since the last
  * checkpoint (exactly-once via the streaming file-source checkpoint
  * + the view's copy-on-write generation swap), then stops.
  *
  * Exactness contract (StreamingMatViewSpec): after any sequence of
  * runs over any file arrival order, the view equals the direct full
  * aggregate over everything that has arrived — the integer-sum merge
  * is associative, so micro-batch boundaries cannot show through.
  */
object StreamingMatView {

  /** Drain everything currently under `factPath` into the view at
    * `viewPath`; returns once the backlog is processed. */
  def maintainAvailableNow(
      spark: SparkSession, factPath: String, schema: StructType,
      keys: Seq[String], ntok: Column,
      viewPath: String, checkpoint: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(factPath)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        MatViewOps.refresh(spark, viewPath,
          MatViewOps.partial(batch, keys, ntok), keys)
      }
      .start()
    try q.awaitTermination(300000) finally q.stop()
  }
}
