package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite

/** The config-gated optimizer rule must turn the nested-loop range
  * join into a bucket-expansion equi-join WITHOUT changing results. */
class RangeRewriteSpec extends AnyFunSuite {
  import TestSession._

  private def points() = spark.range(0, 20000).select(
    (col("id") % 1000).cast("double").as("p"), col("id").as("pid"))

  // [lo, hi) intervals of length 3, plus one inverted interval that
  // must be dropped before expansion (sequence would go descending)
  private def intervals() = spark.range(0, 500).select(
    (col("id") * 2).cast("double").as("lo"),
    when(col("id") === 7, (col("id") * 2 - 5).cast("double"))
      .otherwise((col("id") * 2 + 3).cast("double")).as("hi"),
    col("id").as("iid"))

  private def joined() = points().join(intervals(),
    col("p") >= col("lo") && col("p") < col("hi"))

  test("rewrite fires, kills the nested-loop join, keeps results exact") {
    val baseline = joined().collect().toSeq // rule off: BNLJ reference run
    assert(baseline.nonEmpty)
    spark.conf.set(RangeJoinRewrite.WidthKey, "8.0")
    try {
      val df = joined()
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("_graft_pb") && opt.contains("explode"),
        s"rewrite did not fire:\n$opt")
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin"),
        s"still a nested-loop join:\n$phys")
      assert(df.collect().toSeq.map(_.toString).sorted ==
        baseline.map(_.toString).sorted)
    } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
  }

  test("rule leaves equi-joins and non-range joins alone") {
    spark.conf.set(RangeJoinRewrite.WidthKey, "8.0")
    try {
      val equi = points().join(intervals(), col("p") === col("lo"))
      assert(!equi.queryExecution.optimizedPlan.toString.contains("_graft_pb"))
      val theta = points().join(intervals(), col("p") > col("lo"))
      assert(!theta.queryExecution.optimizedPlan.toString.contains("_graft_pb"))
    } finally spark.conf.unset(RangeJoinRewrite.WidthKey)
  }
}
