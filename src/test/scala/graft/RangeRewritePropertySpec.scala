package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite

/** Randomized cross-check of the optimizer rewrite: on random points,
  * random (possibly inverted or empty) intervals, random bucket
  * widths, either operand order in the bounds, and the point side on
  * the left OR the right of the join, the rewritten plan's multiset of
  * results must equal the nested-loop baseline's. */
class RangeRewritePropertySpec extends AnyFunSuite {
  import TestSession._

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().toSeq.groupBy(_.toString).map { case (k, v) => k -> v.size }

  test("rewrite equals the nested-loop baseline on random inputs") {
    val rnd = new Random(42)
    for (trial <- 0 until 5) {
      val nPts = 500 + rnd.nextInt(1500)
      val nIv = 20 + rnd.nextInt(120)
      val span = 1.0 + rnd.nextDouble() * 999.0
      val width = math.max(0.5, span / (1 + rnd.nextInt(40)))
      import spark.implicits._
      val pts = Seq.tabulate(nPts)(i =>
        (i.toLong, rnd.nextDouble() * span - span / 4))
        .toDF("pid", "p")
      val ivs = Seq.tabulate(nIv) { i =>
        val a = rnd.nextDouble() * span - span / 4
        // ~15% inverted or empty intervals — must match nothing
        val b = if (rnd.nextDouble() < 0.15) a - rnd.nextDouble() * 10
          else a + rnd.nextDouble() * (span / 10)
        (i.toLong, a, b)
      }.toDF("iid", "lo", "hi")

      def joined(): DataFrame = trial % 3 match {
        case 0 => pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
        case 1 => pts.join(ivs, col("lo") <= col("p") && col("hi") > col("p"))
        case 2 => ivs.join(pts, col("p") >= col("lo") && col("p") < col("hi"))
      }

      val baseline = multiset(joined())
      spark.conf.set(RangeJoinRewrite.WidthKey, width.toString)
      try {
        val df = joined()
        assert(df.queryExecution.optimizedPlan.toString.contains("_graft_pb"),
          s"trial $trial: rewrite did not fire")
        assert(multiset(df) == baseline, s"trial $trial diverged")
      } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
    }
  }
}
