package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExtendedOps

/** Skew handling at scale, both runtime and explicit:
  *
  *  1. AQE's skew-join split: with broadcast off (modeling a dim too
  *     large to broadcast), a hot key concentrates one shuffle
  *     partition; AQE must detect it at runtime and split it into
  *     multiple reader tasks (the executed plan shows a skewed
  *     AQEShuffleRead). This is the 100 TB default path — no manual
  *     tuning, the optimizer re-plans from the real map-output sizes.
  *  2. The explicit salted join must produce the identical multiset
  *     on the same skewed input — the fallback when even a split
  *     single key exceeds one task's memory.
  */
class AqeSkewSpec extends AnyFunSuite {
  import TestSession._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // ~200k rows on key 0, ~1k spread over 100 other keys.
  private def skewed() = spark.range(0, 201000).select(
    when(col("id") < 200000, lit(0L)).otherwise(col("id") % 100 + 1).as("k"),
    col("id").as("v"))

  private def dim() = spark.range(0, 101).select(
    col("id").as("k"), (col("id") * 10).as("w"))

  test("AQE splits the skewed join partition at runtime") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB") {
      val joined = skewed().join(dim(), Seq("k"))
      // run THIS QueryExecution (count() would plan a separate one)
      assert(joined.collect().length == 201000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew"),
        s"expected a skew-split AQEShuffleRead in:\n$plan")
    }
  }

  test("salted join equals the plain join on the skewed input") {
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plain = skewed().join(dim(), Seq("k"))
      val salted = ExtendedOps.saltedJoin(skewed(), dim(), Seq("k"), salts = 8)
      assert(salted.count() == 201000L)
      assert(salted.exceptAll(plain).isEmpty &&
        plain.exceptAll(salted).isEmpty)
    }
  }
}
