package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SmoothOps

/** The SmoothOps Kalman fold against a hand-computed reference, plus
  * the degenerate-input contract (empty and single-observation series
  * produce empty output, never a slice error). */
class SmoothSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("kalman filter matches the hand fold on a known series") {
    val df = Seq((1, 10.0), (2, 22.0), (3, 14.0), (4, 18.0))
      .toDF("t", "x")
    val out = SmoothOps.kalman(df, "t", "x", 2.0, 10.0)
      .orderBy(col("t")).collect()
    // reference fold, q=2 r=10, init l=10 p=10
    var l = 10.0; var p = 10.0
    val expect = Seq(22.0, 14.0, 18.0).map { z =>
      val pp = p + 2.0
      val k = pp / (pp + 10.0)
      val pred = l
      l = l + k * (z - l)
      p = (1.0 - k) * pp
      (pred, k, l)
    }
    assert(out.length == 3)
    // operator output is rounded to 6 decimals
    for ((r, (pred, k, filt)) <- out.zip(expect)) {
      assert(math.abs(r.getAs[Double]("pred") - pred) < 1e-6)
      assert(math.abs(r.getAs[Double]("gain") - k) < 1e-6)
      assert(math.abs(r.getAs[Double]("filt") - filt) < 1e-6)
    }
  }

  test("gain converges toward the steady-state value") {
    val df = (1 to 50).map(i => (i, 100.0 + (i % 3))).toDF("t", "x")
    val gains = SmoothOps.kalman(df, "t", "x", 2.0, 10.0)
      .orderBy(col("t")).select(col("gain")).collect().map(_.getDouble(0))
    // steady state of p = (1-k)(p+q), k = (p+q)/(p+q+r): k* solves
    // k* = (k*r + q) / (k*r + q + r) — for q=2 r=10, k* ~ 0.3583
    val kStar = gains.last
    assert(math.abs(gains(gains.length - 2) - kStar) < 2e-6,
      "gain should have converged")
    assert(kStar > 0.35 && kStar < 0.37, s"steady-state gain $kStar")
  }

  test("empty and single-row series yield empty output, not an error") {
    val empty = Seq.empty[(Int, Double)].toDF("t", "x")
    assert(SmoothOps.kalman(empty, "t", "x", 2.0, 10.0).count() == 0L)
    val one = Seq((1, 5.0)).toDF("t", "x")
    assert(SmoothOps.kalman(one, "t", "x", 2.0, 10.0).count() == 0L)
  }
}
