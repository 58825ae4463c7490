package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.operators.TextSearchOps

/** Incremental inverted-index maintenance (streaming twin of
  * TextSearchOps.buildIndex): new document files landing under
  * `docsPath` are drained with Trigger.AvailableNow and each
  * micro-batch either bootstraps the index (first run) or APPENDS its
  * postings/doc lengths and merges the corpus stats — the index is
  * built once and extended forever, never rebuilt. The scheduler-run
  * shape for a growing 100-TB corpus: every invocation processes only
  * files that arrived since the last checkpoint, then stops on its
  * own.
  *
  * Exactness contract (IncrementalIndexSpec): after any sequence of
  * runs, postings/doclen/stats — and therefore BM25 scores — are
  * identical to a from-scratch buildIndex over the whole corpus.
  */
object StreamingIndexer {

  /** Drain everything currently under `docsPath` into the index at
    * `indexDir`; returns after the backlog is processed (throws if
    * the drain exceeds `timeoutMs`). foreachBatch is at-least-once,
    * so each batch applies through
    * TextSearchOps.applyBatchIdempotent: deterministic batch-named
    * appends behind a per-batch marker, intent-logged bootstrap —
    * crash-replay never double-applies or half-applies a batch. */
  def maintainAvailableNow(
      spark: SparkSession, docsPath: String, schema: StructType,
      idCol: String, textCol: String,
      indexDir: String, checkpoint: String,
      timeoutMs: Long = 300000L): Unit = {
    val stream = spark.readStream.schema(schema).parquet(docsPath)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        TextSearchOps.applyBatchIdempotent(
          batch, idCol, textCol, indexDir, batchId.toString)
      }
      .start()
    try {
      if (!q.awaitTermination(timeoutMs))
        throw new java.util.concurrent.TimeoutException(
          s"StreamingIndexer: backlog drain of $docsPath did not " +
            s"complete within ${timeoutMs}ms")
    } finally q.stop()
  }
}
