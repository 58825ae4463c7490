package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DtwAlign

/** Banded-DTW ALIGN (reference AlignTableResult): the distributed
  * per-key DP must agree with an independent brute-force DTW, and the
  * path must satisfy DTW's structural invariants (monotone, connected,
  * endpoints pinned). Runs the DP directly for the randomized checks;
  * the Spark plumbing is covered by the q228 test. */
class DtwAlignSpec extends AnyFunSuite {

  /** Memoized reference DTW: min cumulative |va-vb| path cost over all
    * monotone paths; no band. Independent of the production DP. */
  private def bruteCost(a: Array[Double], b: Array[Double]): Double = {
    val memo = scala.collection.mutable.Map.empty[(Int, Int), Double]
    def go(i: Int, j: Int): Double = memo.getOrElseUpdate((i, j), {
      val d = math.abs(a(i) - b(j))
      if (i == 0 && j == 0) d
      else {
        var best = Double.PositiveInfinity
        if (i > 0 && j > 0) best = math.min(best, go(i - 1, j - 1))
        if (i > 0) best = math.min(best, go(i - 1, j))
        if (j > 0) best = math.min(best, go(i, j - 1))
        best + d
      }
    })
    go(a.length - 1, b.length - 1)
  }

  private def pts(a: Array[Double]): Array[(Long, Double)] =
    a.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  private def pathCost(a: Array[Double], b: Array[Double],
      path: Seq[(Int, Int)]): Double =
    path.map { case (i, j) => math.abs(a(i) - b(j)) }.sum

  test("unbounded DP cost equals brute-force optimal cost (500 random)") {
    val rnd = new Random(42)
    for (_ <- 1 to 500) {
      val a = Array.fill(1 + rnd.nextInt(8))(rnd.nextDouble() * 10 - 5)
      val b = Array.fill(1 + rnd.nextInt(8))(rnd.nextDouble() * 10 - 5)
      val path = DtwAlign.dtwPath(pts(a), pts(b), None)
      assert(math.abs(pathCost(a, b, path) - bruteCost(a, b)) < 1e-9,
        s"cost mismatch for ${a.toSeq} vs ${b.toSeq}")
    }
  }

  test("path is monotone, connected, endpoint-pinned (500 random, banded)") {
    val rnd = new Random(7)
    for (_ <- 1 to 500) {
      val a = Array.fill(1 + rnd.nextInt(12))(rnd.nextDouble() * 10 - 5)
      val b = Array.fill(1 + rnd.nextInt(12))(rnd.nextDouble() * 10 - 5)
      val w = 1 + rnd.nextInt(4)
      val path = DtwAlign.dtwPath(pts(a), pts(b), Some(w))
      assert(path.head == ((0, 0)))
      assert(path.last == ((a.length - 1, b.length - 1)))
      for (((i1, j1), (i2, j2)) <- path.zip(path.tail)) {
        val di = i2 - i1; val dj = j2 - j1
        assert((di == 0 || di == 1) && (dj == 0 || dj == 1) && di + dj > 0,
          s"non-monotone step ($i1,$j1)->($i2,$j2)")
      }
    }
  }

  test("banded cost never beats the unbounded optimum (200 random)") {
    val rnd = new Random(11)
    for (_ <- 1 to 200) {
      val a = Array.fill(2 + rnd.nextInt(8))(rnd.nextDouble() * 10 - 5)
      val b = Array.fill(2 + rnd.nextInt(8))(rnd.nextDouble() * 10 - 5)
      val free = pathCost(a, b, DtwAlign.dtwPath(pts(a), pts(b), None))
      val banded = pathCost(a, b, DtwAlign.dtwPath(pts(a), pts(b), Some(1)))
      assert(banded >= free - 1e-12)
    }
  }

  test("q228 emits per-user paths with dense steps and d >= 0") {
    import TestSession._
    val rows = SparkEntry.queries("q228_dtw_align")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    for ((_, rs) <- byUser.take(20)) {
      val steps = rs.map(_.getAs[Int]("step")).sorted
      assert(steps.toSeq == (1 to rs.length))
      assert(rs.forall(_.getAs[Double]("d") >= 0.0))
    }
  }

  test("GRAFT DTW statement equals the direct operator call") {
    import TestSession._
    import org.apache.spark.sql.functions.{col, round}
    val t = Tables(spark, sfDir)
    t.events.filter(col("event_type") === "click")
      .createOrReplaceTempView("dtw_clicks")
    t.events.filter(col("event_type") === "purchase")
      .createOrReplaceTempView("dtw_purchases")
    val viaSql = spark.sql(
      "GRAFT DTW dtw_clicks WITH dtw_purchases KEY user_id " +
        "ORDER ts VALUE value MARGIN 3")
      .select(col("key").as("user_id"), col("step"),
        col("a_ord"), col("b_ord"), round(col("d"), 6).as("d"))
    val direct = SparkEntry.queries("q228_dtw_align")(spark, sfDir)
    assert(viaSql.exceptAll(direct).count() == 0 &&
      direct.exceptAll(viaSql).count() == 0)
  }
}
