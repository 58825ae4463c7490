package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Two-group log-rank test (q310): the declarative pivot + suffix-sum
  * + ordered-fold shape must agree with an independent sequential
  * implementation of the Mantel 1966 statistic. Cross-engine value
  * equality goes through the DuckDB gate. */
class LogrankSpec extends AnyFunSuite {
  import TestSession._

  /** Reference: sequential log-rank over (group, time, observed). */
  private def logrank(subjects: Seq[(Int, Long, Boolean)])
      : (Long, Double, Double) = {
    val deathTimes = subjects.filter(_._3).map(_._2).distinct.sorted
    var o1 = 0L; var e1 = 0.0; var v1 = 0.0
    for (t <- deathTimes) {
      val atRisk = subjects.filter(_._2 >= t)
      val n = atRisk.size.toDouble
      val n1 = atRisk.count(_._1 == 1).toDouble
      val d = atRisk.count(s => s._2 == t && s._3).toDouble
      val d1 = atRisk.count(s => s._1 == 1 && s._2 == t && s._3)
      o1 += d1
      e1 += d * n1 / n
      if (n > 1) v1 += d * (n1 / n) * (1.0 - n1 / n) * ((n - d) / (n - 1))
    }
    (o1, e1, v1)
  }

  test("q310: o1/e1/v1/chi2 match a sequential reference") {
    val row = queries.Stats.queries("q310_logrank")(spark, sfDir)
      .collect().head
    val ev = Tables(spark, sfDir).events
    val endS = ev.agg(max(unix_timestamp(col("ts")))).head.getLong(0)
    val subjects = ev.groupBy(col("user_id"))
      .agg(min(unix_timestamp(col("ts"))).as("f"),
        max(unix_timestamp(col("ts"))).as("l"))
      .collect().toSeq.map { r =>
        val uid = r.getAs[Long]("user_id")
        val f = r.getAs[Long]("f"); val l = r.getAs[Long]("l")
        ((uid % 2).toInt, (l - f) / 86400, endS - l > 86400L)
      }
    val (o1, e1, v1) = logrank(subjects)
    assert(row.getAs[Long]("o1") == o1)
    assert(math.abs(row.getAs[Double]("e1") - e1) < 1e-9)
    assert(math.abs(row.getAs[Double]("v1") - v1) < 1e-9)
    val chi2 = (o1 - e1) * (o1 - e1) / v1
    assert(math.abs(row.getAs[Double]("chi2") - chi2) < 1e-9)
  }

  test("reference: mirrored groups give chi2 = 0, disjoint groups don't") {
    // two groups with identical lifetime/censoring profiles: every
    // death time has n1/n = 1/2 and d1 = d/2, so O1 = E1 exactly
    val mirrored = (0 until 20).flatMap { i =>
      val t = (i % 5).toLong; val obs = i % 2 == 0
      Seq((0, t, obs), (1, t, obs))
    }
    val (o1m, e1m, _) = logrank(mirrored)
    assert(math.abs(o1m - e1m) < 1e-12)
    // group 1 dies strictly earlier: statistic must be positive
    val shifted = (0 until 10).map(i => (1, i.toLong, true)) ++
      (0 until 10).map(i => (0, i.toLong + 10, true))
    val (o1s, e1s, v1s) = logrank(shifted)
    assert(v1s > 0 && (o1s - e1s) * (o1s - e1s) / v1s > 3.841)
  }
}
