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

  /** Reference: Mann-Kendall S, Var S (tie-corrected), z, tau-b. */
  private def mannKendall(xs: Array[Long])
      : (Long, Double, Double, Double) = {
    val n = xs.length
    var s = 0L
    for (i <- 0 until n; j <- (i + 1) until n)
      s += java.lang.Long.signum(xs(j) - xs(i)).toLong
    val ties = xs.groupBy(identity).values.map(_.length.toLong)
    val tie3 = ties.map(t => t * (t - 1) * (2 * t + 5)).sum
    val tie2 = ties.map(t => t * (t - 1)).sum
    val varS = (n.toLong * (n - 1) * (2L * n + 5) - tie3) / 18.0
    val z =
      if (s > 0) (s - 1) / math.sqrt(varS)
      else if (s < 0) (s + 1) / math.sqrt(varS)
      else 0.0
    val np = n.toLong * (n - 1) / 2
    val tau = s / math.sqrt((np - tie2 / 2.0) * np)
    (s, varS, z, tau)
  }

  test("q312: S/VarS/z/tau match a local reference; monotone sanity") {
    val out = queries.Stats.queries("q312_mann_kendall")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val daily = Tables(spark, sfDir).events
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("event_type"), col("d"))
      .collect().groupBy(_.getAs[String]("event_type"))
    for ((et, rows) <- daily) {
      val xs = rows.sortBy(_.getAs[java.sql.Date]("d").toString)
        .map(_.getAs[Long]("x"))
      val (s, varS, z, tau) = mannKendall(xs)
      val got = out(et)
      assert(got.getAs[Long]("s_stat") == s)
      assert(math.abs(got.getAs[Double]("var_s") - varS) < 1e-9)
      assert(math.abs(got.getAs[Double]("z") - z) < 1e-12)
      assert(math.abs(got.getAs[Double]("tau_b") - tau) < 1e-12)
    }
    // strictly increasing series: S = n(n-1)/2, tau_b = 1, z > 0
    val (sm, _, zm, taum) = mannKendall(Array(1L, 3L, 4L, 8L, 9L, 12L))
    assert(sm == 15L && math.abs(taum - 1.0) < 1e-12 && zm > 0)
  }

  /** Reference: Wald-Wolfowitz runs test around the median. */
  private def runsTest(xs: Array[Long]): (Long, Long, Long, Double) = {
    val sorted = xs.sorted
    val n = xs.length
    val med =
      if (n % 2 == 1) sorted(n / 2).toDouble
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    val signs = xs.filter(_.toDouble != med).map(_ > med)
    val n1 = signs.count(identity).toLong
    val n2 = signs.length - n1
    val runs = 1L + signs.sliding(2).count {
      case Array(a, b) => a != b
      case _ => false
    }
    val mu = 1.0 + 2.0 * n1 * n2 / (n1 + n2)
    val v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2) /
      ((n1 + n2).toDouble * (n1 + n2) * (n1 + n2 - 1))
    (n1, n2, runs, (runs - mu) / math.sqrt(v))
  }

  test("q315: runs/n1/n2/z match a local reference; alternation sanity") {
    val out = queries.Stats.queries("q315_runs_test")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val daily = Tables(spark, sfDir).events
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("event_type"), col("d"))
      .collect().groupBy(_.getAs[String]("event_type"))
    for ((et, rows) <- daily) {
      val xs = rows.sortBy(_.getAs[java.sql.Date]("d").toString)
        .map(_.getAs[Long]("x"))
      val (n1, n2, runs, z) = runsTest(xs)
      val got = out(et)
      assert(got.getAs[Long]("n1") == n1 && got.getAs[Long]("n2") == n2)
      assert(got.getAs[Long]("runs") == runs)
      assert(math.abs(got.getAs[Double]("z") - z) < 1e-12)
    }
    // perfect alternation = maximum runs, strongly positive z;
    // perfect clumping = 2 runs, strongly negative z
    val (_, _, rA, zA) = runsTest(Array(1L, 9, 1, 9, 1, 9, 1, 9, 1, 9))
    assert(rA == 10L && zA > 2.0)
    val (_, _, rC, zC) = runsTest(Array(1L, 1, 1, 1, 1, 9, 9, 9, 9, 9))
    assert(rC == 2L && zC < -2.0)
  }

  /** Reference: Hodges-Lehmann = median of Walsh averages (i <= j). */
  private def hodgesLehmann(xs: Array[Long]): Double = {
    val walsh = for {
      i <- xs.indices; j <- i until xs.length
    } yield (xs(i) + xs(j)) / 2.0
    median(walsh.toArray)
  }

  test("q316: HL location matches a local reference and shrugs at outliers") {
    val out = queries.Stats.queries("q316_hodges_lehmann")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val daily = Tables(spark, sfDir).events
      .groupBy(col("event_type"), col("ts").cast("date").as("d"))
      .agg(count(lit(1)).as("x"))
      .orderBy(col("event_type"), col("d"))
      .collect().groupBy(_.getAs[String]("event_type"))
    for ((et, rows) <- daily) {
      val xs = rows.map(_.getAs[Long]("x"))
      val got = out(et)
      assert(got.getAs[Long]("n_walsh") ==
        xs.length.toLong * (xs.length + 1) / 2)
      assert(math.abs(got.getAs[Double]("hl_location")
        - hodgesLehmann(xs)) < 1e-12)
    }
    // one wild outlier moves the mean by ~90 but HL by < 1
    val clean = Array.tabulate(21)(i => 10L + (i % 3))
    val dirty = clean.updated(7, 2000L)
    assert(math.abs(hodgesLehmann(dirty) - hodgesLehmann(clean)) < 1.0)
    assert(dirty.sum / 21.0 - clean.sum / 21.0 > 90.0)
  }

  test("q318: Murphy decomposition identity Brier = REL - RES + UNC") {
    val row = queries.Stats.queries("q318_calibration")(spark, sfDir)
      .collect().head
    val brier = row.getAs[Double]("brier")
    val rel = row.getAs[Double]("reliability")
    val res = row.getAs[Double]("resolution")
    val unc = row.getAs[Double]("uncertainty")
    // the 1973 decomposition is an algebraic identity when forecasts
    // are constant within groups — a broken fold breaks the identity
    assert(math.abs(brier - (rel - res + unc)) < 1e-12,
      s"identity violated: $brier != $rel - $res + $unc")
    assert(brier >= 0 && rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25)
    // forecasts learned on one half should carry real skill on the
    // other: resolution strictly positive (return rate varies by month)
    assert(res > 0)
  }

  test("GRAFT TREND statement lowers to the TrendOps bodies") {
    val t = Tables(spark, sfDir)
    t.registerAll()
    spark.sql(
      """SELECT event_type AS k, CAST(ts AS DATE) AS d,
        |  CAST(COUNT(*) AS DOUBLE) AS x
        |FROM events GROUP BY 1, 2""".stripMargin)
      .createOrReplaceTempView("trend_in")
    val viaOpTs = operators.TrendOps
      .theilSen(spark.table("trend_in"), "k", "d", "x")
      .orderBy(col("k")).collect().toSeq
    val viaSqlTs = spark
      .sql("GRAFT TREND trend_in KEY k TIME d VALUE x METHOD THEILSEN")
      .orderBy(col("k")).collect().toSeq
    assert(viaSqlTs == viaOpTs)
    val viaOpMk = operators.TrendOps
      .mannKendall(spark.table("trend_in"), "k", "d", "x")
      .orderBy(col("k")).collect().toSeq
    val viaSqlMk = spark
      .sql("GRAFT TREND trend_in KEY k TIME d VALUE x METHOD MANNKENDALL")
      .orderBy(col("k")).collect().toSeq
    assert(viaSqlMk == viaOpMk)
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
