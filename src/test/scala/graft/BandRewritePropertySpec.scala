package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.BandJoinRewrite

/** Randomized cross-check of the keyed band-join rewrite: on random
  * keyed points and (possibly inverted, empty, or null-keyed)
  * intervals, either operand order in the bounds, the point side on
  * either side of the join, and an extra residual predicate, the
  * rewritten plan's multiset of results must equal the hash-join +
  * filter baseline's. */
class BandRewritePropertySpec extends AnyFunSuite {
  import TestSession._

  private def multiset(df: DataFrame): Map[String, Int] =
    df.collect().toSeq.groupBy(_.toString).map { case (k, v) => k -> v.size }

  test("band rewrite equals the hash-join baseline on random inputs") {
    val rnd = new Random(7)
    for (trial <- 0 until 6) {
      import spark.implicits._
      val nPts = 300 + rnd.nextInt(700)
      val nIv = 100 + rnd.nextInt(300)
      val pts = Seq.tabulate(nPts) { i =>
        val k: java.lang.Long =
          if (rnd.nextDouble() < 0.05) null else rnd.nextInt(6).toLong
        (i.toLong, k, rnd.nextInt(1000).toLong)
      }.toDF("pid", "k", "t")
      val ivs = Seq.tabulate(nIv) { i =>
        val k: java.lang.Long =
          if (rnd.nextDouble() < 0.05) null else rnd.nextInt(6).toLong
        val a = rnd.nextInt(1000).toLong
        val b = if (rnd.nextDouble() < 0.15) a - rnd.nextInt(30)
          else a + rnd.nextInt(80).toLong
        (i.toLong, k, a, b)
      }.toDF("iid", "ik", "lo", "hi")

      def joined(): DataFrame = trial % 3 match {
        case 0 => pts.join(ivs, col("k") === col("ik") &&
          col("t") >= col("lo") && col("t") < col("hi"))
        case 1 => pts.join(ivs, col("ik") === col("k") &&
          col("lo") <= col("t") && col("hi") > col("t") &&
          col("pid") =!= col("iid")) // residual conjunct survives
        case 2 => ivs.join(pts, col("k") === col("ik") &&
          col("t") >= col("lo") && col("t") < col("hi"))
      }

      val baseline = multiset(joined())
      spark.conf.set(BandJoinRewrite.EnabledKey, "true")
      try {
        val df = joined()
        assert(df.queryExecution.optimizedPlan.toString.contains("BandJoin"),
          s"trial $trial: rewrite did not fire")
        assert(multiset(df) == baseline, s"trial $trial diverged")
      } finally spark.conf.unset(BandJoinRewrite.EnabledKey)
    }
  }

  test("the rewrite leaves plain equi-joins and keyless band joins alone") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val b = Seq((1L, 1L, 100L), (2L, 15L, 30L)).toDF("bk", "lo", "hi")
    spark.conf.set(BandJoinRewrite.EnabledKey, "true")
    try {
      val equiOnly = a.join(b, col("k") === col("bk"))
      assert(!equiOnly.queryExecution.optimizedPlan.toString
        .contains("BandJoin"))
      val keyless = a.join(b, col("v") >= col("lo") && col("v") < col("hi"))
      assert(!keyless.queryExecution.optimizedPlan.toString
        .contains("BandJoin"))
    } finally spark.conf.unset(BandJoinRewrite.EnabledKey)
  }
}
