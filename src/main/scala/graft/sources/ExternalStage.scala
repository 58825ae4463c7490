package graft.sources

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame

/** Staging area for external-format round-trip sources (CSV/JSON/text).
  *
  * The reference reads external files in place (external/objects/
  * ExternalSource.scala); our test corpus is parquet, so the external
  * source queries first materialize a table in the target format. That
  * write happens ONCE per (sf-dir, format, schema) into a deterministic
  * path under the CacheFs cache root — repeated query invocations
  * (Verify, Bench warmup + timed runs) reuse the staged copy, so
  * nothing leaks per invocation and benchmark timings measure the read
  * path, not the write. Paths and completeness checks go through the
  * Hadoop FileSystem (CacheFs) so the stage lands on shared storage on
  * a real cluster instead of the driver's local tmpdir.
  */
object ExternalStage {

  private def stageDir(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, kind: String, schema: String): Path = {
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    // The schema fingerprint keeps two queries that stage the same
    // `kind` with DIFFERENT projections from silently sharing a copy
    // (observed: a 3-column json_orders staged first starved a
    // full-schema reader of its columns).
    val sig = java.lang.Integer.toHexString(schema.hashCode)
    new Path(CacheFs.root(spark), s"stage_$key/${kind}_$sig")
  }

  /** Write `df` in `kind` format via `write` once; return the staged
    * path. The committer's _SUCCESS marker makes the write idempotent
    * across invocations in the same or later sessions. */
  def materialize(sfDir: String, kind: String, df: => DataFrame)(
      write: (DataFrame, String) => Unit): String = synchronized {
    val frame = df
    val spark = frame.sparkSession
    val dir = stageDir(spark, sfDir, kind, frame.schema.catalogString)
    if (!CacheFs.complete(spark, dir.toString)) {
      write(frame, dir.toString)
    }
    dir.toString
  }
}
