package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary-segmentation changepoint (q308): the distributed
  * windowed-prefix-sum argmin must agree with a straightforward local
  * O(n^2)-free reference that scans every candidate split directly.
  * Value-level cross-engine agreement goes through the DuckDB gate;
  * this pins the algorithm itself against an independent fold. */
class BinsegSpec extends AnyFunSuite {
  import TestSession._

  /** Reference: best single split of xs minimizing two-segment SSE,
    * candidates k in [5, n-5] (left segment = first k points), ties
    * broken toward the smallest k. Returns (k, cost). */
  private def bruteBest(xs: Array[Double]): (Int, Double) = {
    val n = xs.length
    var bestK = -1
    var bestCost = Double.MaxValue
    for (k <- 5 to n - 5) {
      val l = xs.take(k); val r = xs.drop(k)
      def sse(s: Array[Double]): Double = {
        val m = s.sum / s.length
        s.map(v => (v - m) * (v - m)).sum
      }
      val c = sse(l) + sse(r)
      if (c < bestCost - 1e-9) { bestCost = c; bestK = k }
    }
    (bestK, bestCost)
  }

  test("q308: split index and means match a local brute-force scan") {
    val out = queries.Stats.queries("q308_binseg")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.nonEmpty)

    val t = Tables(spark, sfDir)
    val daily = t.events
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).cast("double").as("x"))
      .orderBy(col("event_type"), col("d"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))

    for ((et, rows) <- daily) {
      val xs = rows.sortBy(_.getAs[java.sql.Date]("d").toString)
        .map(_.getAs[Double]("x"))
      val (k, cost) = bruteBest(xs)
      val got = out(et)
      assert(got.getAs[Long]("split_k") == k.toLong,
        s"$et: split_k ${got.getAs[Long]("split_k")} != brute $k")
      val lm = xs.take(k).sum / k
      val rm = xs.drop(k).sum / (xs.length - k)
      assert(math.abs(got.getAs[Double]("left_mean") - lm) < 1e-5)
      assert(math.abs(got.getAs[Double]("right_mean") - rm) < 1e-5)
      assert(math.abs(got.getAs[Double]("sse_split") - cost) < 1e-4,
        s"$et: sse_split ${got.getAs[Double]("sse_split")} != $cost")
      // splitting can only reduce SSE relative to the unsplit series
      assert(got.getAs[Double]("sse_split")
        <= got.getAs[Double]("sse_total") + 1e-6)
    }
  }

  test("q308: a synthetic step series splits exactly at the step") {
    import spark.implicits._
    // 20 days at level 10 then 20 days at level 50: the best split is
    // unambiguous at k=20
    val step = (0 until 40).flatMap { i =>
      val base = java.time.LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      val lvl = if (i < 20) 10 else 50
      (0 until lvl).map(_ => ("step", java.sql.Timestamp.valueOf(
        base.atStartOfDay)))
    }.toDF("event_type", "ts")
    val tmp = java.nio.file.Files
      .createTempDirectory("binseg").toString
    step.write.mode("overwrite")
      .parquet(s"$tmp/events.parquet")
    // the query only touches events; stage the rest as views of sfDir
    for (n <- Tables.names if n != "events") {
      val src = java.nio.file.Paths.get(sfDir, s"$n.parquet")
      val dst = java.nio.file.Paths.get(tmp, s"$n.parquet")
      java.nio.file.Files.createSymbolicLink(dst, src)
    }
    val r = queries.Stats.queries("q308_binseg")(spark, tmp).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("split_k") == 20L)
    assert(math.abs(r.head.getAs[Double]("left_mean") - 10.0) < 1e-9)
    assert(math.abs(r.head.getAs[Double]("right_mean") - 50.0) < 1e-9)
    assert(r.head.getAs[Double]("sse_split") < 1e-9)
  }
}
