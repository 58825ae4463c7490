package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SmoothOps

/** Randomized cross-check of the three SmoothOps folds against
  * independent local reference implementations on random series
  * (random lengths including degenerate ones, random parameters,
  * duplicate-free random times inserted in shuffled order — the
  * operator must re-establish time order itself). */
class SmoothPropertySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val rnd = new Random(11)

  private def randomSeries(n: Int): Seq[(Int, Double)] = {
    val ts = rnd.shuffle((1 to n).toList)
    ts.map(t => (t, math.floor(rnd.nextDouble() * 200.0))) // exact values
  }

  test("kalman equals the local fold on random series") {
    for (_ <- 0 until 5) {
      val n = 2 + rnd.nextInt(120)
      val q = 0.5 + rnd.nextInt(5)
      val r = 1.0 + rnd.nextInt(20)
      val data = randomSeries(n)
      val out = SmoothOps.kalman(data.toDF("t", "x"), "t", "x", q, r)
        .orderBy(org.apache.spark.sql.functions.col("t")).collect()
      val sorted = data.sortBy(_._1).map(_._2)
      var l = sorted.head; var p = r
      val ref = sorted.tail.map { z =>
        val pp = p + q; val k = pp / (pp + r)
        val pred = l
        l = l + k * (z - l); p = (1.0 - k) * pp
        (pred, k, l)
      }
      assert(out.length == ref.length)
      for ((row, (pred, k, filt)) <- out.zip(ref)) {
        assert(math.abs(row.getAs[Double]("pred") - pred) < 1e-6)
        assert(math.abs(row.getAs[Double]("gain") - k) < 1e-6)
        assert(math.abs(row.getAs[Double]("filt") - filt) < 1e-6)
      }
    }
  }

  test("holt equals the local fold on random series") {
    for (_ <- 0 until 5) {
      val n = 2 + rnd.nextInt(120)
      val a = 0.3; val b = 0.2
      val data = randomSeries(n)
      val out = SmoothOps.holt(data.toDF("t", "x"), "t", "x", a, b)
        .orderBy(org.apache.spark.sql.functions.col("t")).collect()
      val sorted = data.sortBy(_._1).map(_._2)
      var l = sorted.head; var tr = 0.0
      val ref = sorted.tail.map { z =>
        val fc = l + tr
        val ln = a * z + (1.0 - a) * (l + tr)
        tr = b * (ln - l) + (1.0 - b) * tr
        l = ln
        fc
      }
      assert(out.length == ref.length)
      for ((row, fc) <- out.zip(ref))
        assert(math.abs(row.getAs[Double]("forecast") - fc) < 1e-6)
    }
  }

  test("holt-winters equals the local fold on random series and season") {
    for (_ <- 0 until 5) {
      val m = 2 + rnd.nextInt(6)
      val n = m + 1 + rnd.nextInt(100)
      val (a, b, g) = (0.3, 0.1, 0.2)
      val data = randomSeries(n)
      val out = SmoothOps
        .holtWinters(data.toDF("t", "x"), "t", "x", m, a, b, g)
        .orderBy(org.apache.spark.sql.functions.col("t")).collect()
      val sorted = data.sortBy(_._1).map(_._2)
      var l = sorted.take(m).sum / m.toDouble
      var tr = 0.0
      val s = Array.tabulate(m)(i => sorted(i) - l)
      val ref = sorted.drop(m).zipWithIndex.map { case (z, j) =>
        val idx = (m + j) % m // == j % m, the slot of observation m+j+1
        val fc = l + tr + s(idx)
        val ln = a * (z - s(idx)) + (1.0 - a) * (l + tr)
        tr = b * (ln - l) + (1.0 - b) * tr
        s(idx) = g * (z - ln) + (1.0 - g) * s(idx)
        l = ln
        fc
      }
      assert(out.length == ref.length)
      for ((row, fc) <- out.zip(ref))
        assert(math.abs(row.getAs[Double]("forecast") - fc) < 1e-6,
          s"m=$m n=$n: ${row.getAs[Double]("forecast")} vs $fc")
    }
  }

  test("ewma control chart matches the local fold and limit structure") {
    import org.apache.spark.sql.functions.col
    val rows = SparkEntry.queries("q320_ewma_chart")(spark, sfDir)
      .orderBy(col("d")).collect()
    assert(rows.length > 10)
    val xs = rows.map(_.getAs[Long]("x").toDouble)
    val mu = xs.sum / xs.length
    // z recursion: z_0 seeds at mu, z_t = 0.2 x_t + 0.8 z_{t-1}
    var z = mu
    for ((row, x) <- rows.zip(xs)) {
      z = 0.2 * x + 0.8 * z
      assert(math.abs(row.getAs[Double]("z") - z) < 1e-5,
        s"z drifted at ${row.getAs[java.sql.Date]("d")}")
    }
    // limits: symmetric around mu, strictly widening to the asymptote
    var prevHw = 0.0
    for (row <- rows) {
      val hw = row.getAs[Double]("ucl") - mu
      assert(math.abs((mu - row.getAs[Double]("lcl")) - hw) < 1e-5)
      assert(hw > prevHw - 1e-12, "limits must widen monotonically")
      prevHw = hw
    }
    // flag is a pure function of the emitted columns
    for (row <- rows)
      assert(row.getAs[Boolean]("outf") ==
        (row.getAs[Double]("z") > row.getAs[Double]("ucl") ||
          row.getAs[Double]("z") < row.getAs[Double]("lcl")))
  }

  test("degenerate series: shorter than the season yields empty output") {
    val df = Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("t", "x")
    assert(SmoothOps.holtWinters(df, "t", "x", 7, 0.3, 0.1, 0.2)
      .count() == 0L)
    assert(SmoothOps.holt(Seq((1, 1.0)).toDF("t", "x"), "t", "x",
      0.3, 0.2).count() == 0L)
  }
}
