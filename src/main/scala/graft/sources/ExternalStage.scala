package graft.sources

import java.io.File

import org.apache.spark.sql.DataFrame

/** Staging area for external-format round-trip sources (CSV/JSON/text).
  *
  * The reference reads external files in place (external/objects/
  * ExternalSource.scala); our test corpus is parquet, so the external
  * source queries first materialize a table in the target format. That
  * write happens ONCE per (sf-dir, format) into a deterministic temp
  * path — repeated query invocations (Verify, Bench warmup + timed
  * runs) reuse the staged copy, so nothing leaks per invocation and
  * benchmark timings measure the read path, not the write.
  */
object ExternalStage {

  private def stageDir(sfDir: String, kind: String, schema: String): File = {
    val key = java.lang.Integer.toHexString(sfDir.hashCode)
    // The schema fingerprint keeps two queries that stage the same
    // `kind` with DIFFERENT projections from silently sharing a copy
    // (observed: a 3-column json_orders staged first starved a
    // full-schema reader of its columns).
    val sig = java.lang.Integer.toHexString(schema.hashCode)
    new File(new File(System.getProperty("java.io.tmpdir"),
      s"graft_stage_$key"), s"${kind}_$sig")
  }

  /** Write `df` in `kind` format via `write` once; return the staged
    * path. A _SUCCESS marker makes the write idempotent across
    * invocations in the same or later sessions. */
  def materialize(sfDir: String, kind: String, df: => DataFrame)(
      write: (DataFrame, String) => Unit): String = synchronized {
    val frame = df
    val dir = stageDir(sfDir, kind, frame.schema.catalogString)
    if (!new File(dir, "_SUCCESS").exists()) {
      write(frame, dir.toString)
    }
    dir.toString
  }
}
