package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout planning for multi-dimensional pruning: Z-order
  * (Morton) clustering, the standard lakehouse technique for making
  * file-level min/max statistics selective on MORE THAN ONE column.
  *
  * A range-clustered layout (q131) gives each file a narrow span on
  * ONE sort column; every other column spans the full domain, so
  * predicates on them prune nothing. Interleaving the bits of two
  * normalized coordinates makes z-contiguous files cover small
  * RECTANGLES of the 2-D space — a filter on either dimension (or
  * both) skips most files from footer statistics alone. At 100 TB
  * this is the difference between scanning a corpus and scanning a
  * few hundred files.
  *
  * The interleave is a static unrolled expression over built-in
  * bit ops — whole-stage codegen, no UDF.
  */
object LayoutOps {

  /** Morton-interleave two 16-bit coordinates (x even bits, y odd). */
  def interleave16(x: Column, y: Column): Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Scale a numeric column to the 16-bit grid given its domain. */
  def normalize16(c: Column, mn: Double, mx: Double): Column =
    if (mx <= mn) lit(0L)
    else least(lit(65535L),
      floor((c.cast("double") - mn) / (mx - mn) * 65536.0).cast("long"))

  /** Z-order `df` on (xCol, yCol) into `files` range partitions at
    * `path`. The domain bounds are layout-time metadata (one tiny agg,
    * the same planning read a range-clustered write needs). */
  def writeZordered(
      df: DataFrame, xCol: String, yCol: String, files: Int,
      path: String): Unit = {
    val b = df.agg(
      min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double"))
      .head()
    val z = interleave16(
      normalize16(col(xCol), b.getDouble(0), b.getDouble(1)),
      normalize16(col(yCol), b.getDouble(2), b.getDouble(3)))
    df.withColumn("_z", z)
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the lakehouse OPTIMIZE maintenance op.
    * Streaming ingestion / per-partition writers leave thousands of
    * tiny files; at 100 TB the footer-read and task-scheduling
    * overhead of a fragmented table dominates scan time. Compaction
    * rewrites the directory into ceil(rows / targetRows) files via
    * ONE round-robin repartition — no shuffle key needed, every
    * output file near target size. Returns the before/after report;
    * the file count is a deterministic function of (rows,
    * targetRows), which is what makes the op oracle-checkable. */
  def compact(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      outDir: String, targetRows: Long): DataFrame = {
    val src = spark.read.parquet(srcDir)
    val before = src.select(input_file_name().as("_f"))
      .agg(countDistinct(col("_f")).cast("long").as("files_before"),
        count(lit(1)).as("rows"))
      .head()
    val rows = before.getLong(1)
    val nOut = math.max(1L, (rows + targetRows - 1) / targetRows).toInt
    src.repartition(nOut).write.mode("overwrite").parquet(outDir)
    val after = spark.read.parquet(outDir)
      .select(input_file_name().as("_f"))
      .agg(countDistinct(col("_f")).cast("long").as("files_after"),
        count(lit(1)).as("rows_after"))
      .head()
    import spark.implicits._
    Seq((rows, before.getLong(0), after.getLong(0), after.getLong(1)))
      .toDF("n_rows", "files_before", "files_after", "n_rows_after")
  }
}
