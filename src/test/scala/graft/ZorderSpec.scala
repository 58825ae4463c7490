package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LayoutOps

/** Z-order layout (LayoutOps): the point of Morton clustering is that
  * file-level min/max statistics become selective on BOTH dimensions.
  * Measured here directly from the written files' actual per-file
  * bounds: a filter on the NON-sort dimension prunes most z-files but
  * NO files of a 1-D sorted layout. */
class ZorderSpec extends AnyFunSuite {
  import TestSession._

  private val nFiles = 16

  private lazy val proj = Tables(spark, sfDir).lineitem
    .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))

  private lazy val (zDir, linDir) = {
    val z = java.nio.file.Files.createTempDirectory("graft_zorder")
    val l = java.nio.file.Files.createTempDirectory("graft_linear")
    LayoutOps.writeZordered(proj, "l_partkey", "l_suppkey", nFiles,
      z.toString)
    proj.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(l.toString)
    (z.toString, l.toString)
  }

  /** Per-file [min, max] of a column, from the data itself (what the
    * parquet footer stats record). */
  private def fileBounds(dir: String, c: String): Array[(Long, Long)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
      .collect()
      .map(r => (r.getAs[Long]("mn"), r.getAs[Long]("mx")))

  test("morton interleave is monotone on the diagonal and bounded") {
    import spark.implicits._
    val codes = Seq(0L, 1L, 255L, 65535L).toDF("v")
      .select(LayoutOps.interleave16(col("v"), col("v")).as("z"))
      .as[Long].collect()
    assert(codes.sameElements(codes.sorted), "diagonal must be monotone")
    assert(codes.last == 0xFFFFFFFFL) // (65535, 65535) fills 32 bits
    val asym = Seq((1L, 0L), (0L, 1L)).toDF("x", "y")
      .select(LayoutOps.interleave16(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(asym(0) == 1L && asym(1) == 2L) // x even bits, y odd bits
  }

  test("z-layout prunes on the non-sort dimension, 1-D layout cannot") {
    // a query on l_suppkey alone (the dimension the 1-D layout does
    // NOT sort by): which files could contain matching rows?
    val all = proj.agg(min(col("l_suppkey")), max(col("l_suppkey")))
      .head()
    val (lo, hi) = (all.getLong(0), all.getLong(1))
    val qLo = lo + (hi - lo) * 2 / 10
    val qHi = lo + (hi - lo) * 3 / 10 // a ~10% suppkey slice
    def touched(dir: String): Int =
      fileBounds(dir, "l_suppkey").count { case (mn, mx) =>
        mx >= qLo && mn <= qHi
      }
    val zTouched = touched(zDir)
    val linTouched = touched(linDir)
    assert(linTouched == nFiles,
      s"1-D partkey sort should leave suppkey unpruned: $linTouched")
    assert(zTouched <= nFiles / 2,
      s"z-order should prune most files on suppkey: $zTouched/$nFiles")
  }

  test("GRAFT ZORDER statement writes the layout and reports it") {
    val d = java.nio.file.Files.createTempDirectory("graft_zorder_sql")
    proj.createOrReplaceTempView("zorder_src")
    val r = spark.sql("GRAFT ZORDER zorder_src BY (l_partkey, l_suppkey) " +
      s"FILES 8 INTO '${d.toString}/out'").head()
    assert(r.getAs[Long]("n_files") == 8)
    assert(r.getAs[Long]("n_rows") == proj.count())
    // the statement-written layout is prunable on the second dimension
    val bounds = fileBounds(s"${d.toString}/out", "l_suppkey")
    val (mn, mx) = (bounds.map(_._1).min, bounds.map(_._2).max)
    val qLo = mn + (mx - mn) * 2 / 10
    val qHi = mn + (mx - mn) * 3 / 10
    assert(bounds.count { case (a, b) => b >= qLo && a <= qHi } < 8)
  }

  test("z-layout keeps the sort dimension prunable too") {
    // a partkey slice still skips most z-files (both dims cluster)
    val all = proj.agg(min(col("l_partkey")), max(col("l_partkey")))
      .head()
    val (lo, hi) = (all.getLong(0), all.getLong(1))
    val qLo = lo + (hi - lo) * 2 / 10
    val qHi = lo + (hi - lo) * 3 / 10
    val zTouched = fileBounds(zDir, "l_partkey").count { case (mn, mx) =>
      mx >= qLo && mn <= qHi
    }
    assert(zTouched <= nFiles * 3 / 4,
      s"z-order lost partkey clustering: $zTouched/$nFiles")
  }
}
