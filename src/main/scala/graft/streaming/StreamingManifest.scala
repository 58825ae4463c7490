package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.sources.FileManifest

/** Streaming lakehouse-layout maintenance (streaming twin of the
  * FileManifest family): new data files landing under `inPath` are
  * drained with Trigger.AvailableNow; each micro-batch is APPENDED
  * to the layout as fresh parquet files and both data-skipping
  * manifests — the min/max envelope manifest and the per-file Bloom
  * manifest — are incrementally refreshed (each refresh indexes only
  * the files the manifest does not know, O(new data) never
  * O(layout)). The scheduler-run shape for a growing 100-TB layout:
  * every invocation processes only what arrived since the last
  * checkpoint, keeps the skipping metadata current, then stops on
  * its own.
  *
  * Exactness contract (StreamingManifestSpec): after any sequence of
  * runs, both manifests equal from-scratch rebuilds over the layout
  * (the Bloom sketches byte-for-byte), so range scans and point
  * lookups through them equal full scans.
  */
object StreamingManifest {

  /** Drain everything currently under `inPath` into the layout at
    * `layoutDir`, keeping the `rangeKey` min/max manifest and the
    * `bloomKey` Bloom manifest current; returns after the backlog is
    * processed. */
  def maintainAvailableNow(
      spark: SparkSession, inPath: String, schema: StructType,
      rangeKey: String, bloomKey: String,
      layoutDir: String, checkpoint: String): Unit = {
    val stream = spark.readStream.schema(schema).parquet(inPath)
    val q = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(layoutDir)
        FileManifest.refresh(spark, layoutDir, rangeKey)
        FileManifest.refreshBloom(spark, layoutDir, bloomKey)
        ()
      }
      .start()
    try q.awaitTermination(300000) finally q.stop()
  }
}
