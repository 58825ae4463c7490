package graft.operators

import java.io.File
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized aggregate view: a grouped aggregate kept
  * as a parquet artifact and maintained by MERGING mergeable partial
  * aggregates — never by re-scanning history. The view stores
  * (keys..., n_rows, n_tokens) where both measures are integer sums,
  * so refresh = re-aggregate(current partials ∪ delta partials) is
  * EXACT and associative: any refresh order, any delta batching,
  * yields bit-identical state to a full recompute (spec-pinned by
  * IncrementalMatViewSpec, the aggregate analogue of
  * IncrementalIndexSpec's build-once/extend-forever inverted index).
  *
  * Scale shape: each refresh scans ONLY the delta (one hash aggregate,
  * map-side combined) plus the current view — and the view is bounded
  * by key cardinality, not history volume, so a 100-TB fact with a
  * 10k-key view refreshes in delta time. Generation swap is
  * write-new-then-rename (the DML copy-on-write discipline); readers
  * of the old generation are unaffected until the swap.
  *
  * Reference analogue: sclera evaluates views by re-execution
  * (modules/core/src/main/scala/sql/ViewTable); the incremental-merge
  * maintenance here is the Spark-native upgrade of that surface.
  */
object MatViewOps {

  /** Mergeable partial aggregate of one delta batch. */
  def partial(delta: DataFrame, keys: Seq[String], ntok: Column): DataFrame =
    delta.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(ntok.cast("long")).as("n_tokens"))

  private def hasView(viewPath: String): Boolean =
    new File(new File(viewPath), "_SUCCESS").exists()

  /** Merge a delta's partials into the view at `viewPath` (creating it
    * if absent): new generation written beside the old, then swapped
    * in via rename. Integer sum re-aggregation — exact. */
  def refresh(spark: SparkSession, viewPath: String,
      deltaPartial: DataFrame, keys: Seq[String]): Unit = {
    val merged =
      if (!hasView(viewPath)) deltaPartial
      else spark.read.parquet(viewPath).unionByName(deltaPartial)
        .groupBy(keys.map(col): _*)
        .agg(sum(col("n_rows")).as("n_rows"),
          sum(col("n_tokens")).as("n_tokens"))
    val next = viewPath + ".next"
    merged.coalesce(1).write.mode("overwrite").parquet(next)
    // generation swap: move old out of the way, promote the new one.
    // Local-FS rename here; on an object store this is the same
    // commit-by-pointer move every table format (Delta/Iceberg) does.
    val old = Paths.get(viewPath + ".old")
    deleteRecursively(old.toFile)
    val cur = Paths.get(viewPath)
    if (Files.exists(cur))
      Files.move(cur, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(next), cur, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old.toFile)
  }

  /** Read the current view generation. */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    spark.read.parquet(viewPath)

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists()) { f.delete(); () }
  }
}
