package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theil-Sen robust trend (q311): the distributed middle-rank
  * selection must agree with an independent local implementation
  * (sort all pairwise slopes, take the exact median), and the
  * estimator must show its defining robustness property. */
class TheilSenSpec extends AnyFunSuite {
  import TestSession._

  private def median(vs: Array[Double]): Double = {
    val s = vs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def theilSen(xs: Array[Double]): (Double, Double) = {
    val slopes = for {
      i <- xs.indices; j <- (i + 1) until xs.length
    } yield (xs(j) - xs(i)) / (j - i).toDouble
    val slope = median(slopes.toArray)
    // residuals against 1-based day index, like the query
    val resid = xs.indices.map(i => xs(i) - slope * (i + 1)).toArray
    (slope, median(resid))
  }

  test("q311: slope and intercept match a local sort-and-pick median") {
    val out = queries.Stats.queries("q311_theil_sen")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(out.nonEmpty)
    val daily = Tables(spark, sfDir).events
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).cast("double").as("x"))
      .orderBy(col("event_type"), col("d"))
      .collect().groupBy(_.getAs[String]("event_type"))
    for ((et, rows) <- daily) {
      val xs = rows.sortBy(_.getAs[java.sql.Date]("d").toString)
        .map(_.getAs[Double]("x"))
      val (slope, intercept) = theilSen(xs)
      val got = out(et)
      assert(got.getAs[Long]("n_days") == xs.length.toLong)
      assert(got.getAs[Long]("n_pairs") ==
        xs.length.toLong * (xs.length - 1) / 2)
      assert(math.abs(got.getAs[Double]("slope") - slope) < 1e-12,
        s"$et: slope ${got.getAs[Double]("slope")} != $slope")
      assert(math.abs(got.getAs[Double]("intercept") - intercept) < 1e-9)
    }
  }

  test("reference: breakdown resistance vs least squares") {
    // clean line y = 2x + 1 with ~29% of points corrupted upward:
    // Theil-Sen holds the true slope, OLS does not
    val n = 21
    val xs = Array.tabulate(n)(i => 2.0 * (i + 1) + 1.0)
    for (i <- Seq(3, 8, 12, 15, 17, 20)) xs(i) += 500.0
    val (slope, _) = theilSen(xs)
    assert(math.abs(slope - 2.0) < 0.75, s"TS slope $slope")
    val mx = (n + 1) / 2.0
    val my = xs.sum / n
    val olsSlope = xs.indices.map(i => ((i + 1) - mx) * (xs(i) - my)).sum /
      xs.indices.map(i => ((i + 1) - mx) * ((i + 1) - mx)).sum
    assert(math.abs(olsSlope - 2.0) > 2.0, s"OLS slope $olsSlope")
  }
}
