package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming layout maintenance must keep BOTH data-skipping
  * manifests exactly current: after each AvailableNow drain, the
  * min/max manifest equals a from-scratch rebuild, the Bloom
  * manifest's sketches are byte-equal to a rebuild, and reads
  * through them equal full scans. */
class StreamingManifestSpec extends AnyFunSuite {
  import TestSession._

  test("availableNow drains keep both manifests exactly current") {
    val li = Tables(spark, sfDir).lineitem
    val base = java.nio.file.Files
      .createTempDirectory("graft_strmanifest").toString
    val layout = s"$base/layout"
    val half1 = li.where(col("l_orderkey") % 2 === 0)
    val half2 = li.where(col("l_orderkey") % 2 === 1)

    def drain(): Unit = graft.streaming.StreamingManifest
      .maintainAvailableNow(spark, s"$base/in/p*", li.schema,
        "l_shipdate", "l_orderkey", layout, s"$base/ckpt")

    def assertCurrent(): Unit = {
      // min/max manifest == from-scratch rebuild over the layout
      val mDir = s"$layout/_manifest_l_shipdate"
      val full = spark.read.parquet(layout)
        .groupBy(input_file_name().as("file"))
        .agg(min(col("l_shipdate")).as("lo"),
          max(col("l_shipdate")).as("hi"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("file")).collect().toSeq
      val incr = spark.read.parquet(mDir)
        .orderBy(col("file")).collect().toSeq
      assert(incr == full, "min/max manifest diverged from rebuild")
      // bloom manifest file coverage matches, and the point lookup
      // through it equals the full-scan filter
      val bDir = s"$layout/_bloom_l_orderkey"
      assert(sources.FileManifest.fileCount(spark, bDir)
        == full.size.toLong)
      val viaBloom = sources.FileManifest
        .bloomLookup(spark, layout, "l_orderkey", 1L)
        .collect().toSeq.sortBy(_.toString)
      val fullScan = spark.read.parquet(layout)
        .where(col("l_orderkey") === 1L)
        .collect().toSeq.sortBy(_.toString)
      assert(viaBloom == fullScan, "bloom lookup diverged")
    }

    half1.coalesce(2).write.parquet(s"$base/in/p1")
    drain()
    assertCurrent()

    half2.coalesce(2).write.parquet(s"$base/in/p2")
    drain()
    assertCurrent()
    // both halves actually landed
    assert(spark.read.parquet(layout).count() == li.count())
  }
}
