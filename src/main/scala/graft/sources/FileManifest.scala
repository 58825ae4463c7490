package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max manifest over a clustered parquet layout — the
  * Delta/Iceberg data-skipping discipline generalized past Hive
  * partition pruning (reference: the external-source location layer,
  * external/; the manifest itself is ours, built for the 100-TB
  * path).
  *
  * A clustered layout (q131 range sort, q214 z-order) gives every
  * FILE a narrow min/max envelope on the cluster column. The
  * manifest records one row per file — (file, min, max, rows) — so a
  * range predicate prunes the FILE LIST before Spark ever lists,
  * schedules, or opens the skipped files. At 100 TB the manifest is
  * ~1 row per file (metadata-scale, like a partition catalog); the
  * driver-side prune is O(#files), never O(data), and the pruned
  * read then still gets parquet row-group/pushdown filtering INSIDE
  * the surviving files.
  *
  * Build is one distributed scan (input_file_name + min/max/count
  * aggregate) staged idempotently behind a _SUCCESS marker, same
  * discipline as ExternalStage.
  */
object FileManifest {

  /** Build (once) the manifest for `layoutDir` on `keyCol`; returns
    * the manifest directory. */
  def build(spark: SparkSession, layoutDir: String, keyCol: String)
      : String = synchronized {
    val dir = new File(layoutDir, s"_manifest_$keyCol")
    if (!new File(dir, "_SUCCESS").exists()) {
      spark.read.parquet(layoutDir)
        .groupBy(input_file_name().as("file"))
        .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("overwrite").parquet(dir.toString)
    }
    dir.toString
  }

  /** Incrementally refresh the manifest after files were APPENDED to
    * the layout: scan only the files the manifest does not know yet
    * (driver-side file listing is O(#files) metadata, the envelope
    * aggregate reads only the new files' data) and append their
    * rows. Equivalent to a full rebuild for append-only layouts —
    * the 100-TB maintenance path, where re-scanning the whole layout
    * per new file batch would be O(data). Returns the number of new
    * files indexed. */
  def refresh(spark: SparkSession, layoutDir: String, keyCol: String)
      : Long = synchronized {
    val mDir = build(spark, layoutDir, keyCol)
    val known = spark.read.parquet(mDir)
      .select(col("file")).collect().map(_.getString(0)).toSet
    val onDisk = new File(layoutDir).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")
        && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => "file://" + f.getAbsolutePath).toSeq
    val fresh = onDisk.filterNot(known)
    if (fresh.nonEmpty) {
      spark.read.parquet(fresh: _*)
        .groupBy(input_file_name().as("file"))
        .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
          count(lit(1)).as("n_rows"))
        .coalesce(1)
        .write.mode("append").parquet(mDir)
    }
    fresh.size.toLong
  }

  /** Files whose [lo, hi] envelope intersects [from, to) — the list
    * a pruned read should pass to spark.read.parquet. Metadata-scale
    * driver action (one row per file, like partition listing). */
  def prunedPaths(spark: SparkSession, manifestDir: String,
      from: Any, to: Any): Seq[String] = {
    spark.read.parquet(manifestDir)
      .where(col("hi") >= lit(from) && col("lo") < lit(to))
      .select(col("file")).collect().map(_.getString(0)).toSeq
  }

  /** Total file count in the manifest (for pruning-rate asserts). */
  def fileCount(spark: SparkSession, manifestDir: String): Long =
    spark.read.parquet(manifestDir).count()

  /** Range-filtered read through the manifest: prune the file list,
    * then apply the residual predicate inside the survivors. */
  def prunedRead(spark: SparkSession, layoutDir: String, keyCol: String,
      from: Any, to: Any): DataFrame = {
    val mDir = build(spark, layoutDir, keyCol)
    val paths = prunedPaths(spark, mDir, from, to)
    require(paths.nonEmpty, s"manifest pruned every file of $layoutDir")
    spark.read.parquet(paths: _*)
      .where(col(keyCol) >= lit(from) && col(keyCol) < lit(to))
  }
}
