package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExtendedOps

/** The custom keyed band/interval join (BandJoinPlan/Strategy/Exec). */
class BandJoinSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val points = Seq(
    (1L, 10L, "p10"),
    (1L, 20L, "p20"),
    (1L, 30L, "p30"),
    (2L, 10L, "q10"),
    (3L, 5L, "r5"))
    .toDF("k", "t", "pname")
  private val intervals = Seq(
    (1L, 5L, 15L, "a"),   // covers p10
    (1L, 10L, 11L, "b"),  // lo inclusive: covers p10
    (1L, 15L, 30L, "c"),  // hi exclusive: covers p20, NOT p30
    (1L, 0L, 100L, "d"),  // covers all of key 1
    (2L, 11L, 12L, "e"),  // after q10: no match
    (4L, 0L, 100L, "f"))  // key absent from points
    .toDF("k", "lo", "hi", "iname")

  test("band join semantics: lo inclusive, hi exclusive, per key") {
    val out = ExtendedOps.bandJoin(
      points, intervals, Seq("k"), "t", "lo", "hi")
      .select($"pname", $"iname").as[(String, String)].collect().toSet
    assert(out == Set(
      ("p10", "a"), ("p10", "b"), ("p10", "d"),
      ("p20", "c"), ("p20", "d"),
      ("p30", "d")))
  }

  test("the plan actually runs the custom exec") {
    val df = ExtendedOps.bandJoin(
      points, intervals, Seq("k"), "t", "lo", "hi")
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("BandJoin"),
      df.queryExecution.executedPlan.toString)
  }

  test("null keys never match each other (EqualTo semantics)") {
    // the sweep's natural key ordering would treat null == null; the
    // direct API must insert IsNotNull guards like the rewrite does
    val np = Seq((Option.empty[Long], 10L, "pnull"), (Some(1L), 10L, "p"))
      .toDF("k", "t", "pname")
    val ni = Seq((Option.empty[Long], 5L, 15L, "inull"),
      (Some(1L), 5L, 15L, "i"))
      .toDF("k", "lo", "hi", "iname")
    val out = ExtendedOps.bandJoin(np, ni, Seq("k"), "t", "lo", "hi")
      .select($"pname", $"iname").as[(String, String)].collect().toSet
    assert(out == Set(("p", "i")))
  }

  test("null point, null endpoints, and empty intervals match nothing") {
    val p = Seq((1L, Option(10L)), (1L, Option.empty[Long]))
      .toDF("k", "t")
    val iv = Seq(
      (1L, Option(5L), Option(15L)),       // matches t=10
      (1L, Option.empty[Long], Option(15L)), // null lo
      (1L, Option(5L), Option.empty[Long]),  // null hi
      (1L, Option(12L), Option(12L)),        // empty [12,12)
      (1L, Option(14L), Option(6L)))         // inverted
      .toDF("k", "lo", "hi")
    val out = ExtendedOps.bandJoin(p, iv, Seq("k"), "t", "lo", "hi")
    assert(out.count() == 1L)
  }

  test("randomized: sweep equals the declarative theta join") {
    val rnd = new Random(42)
    val ps = Seq.fill(400)(
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, rnd.nextInt()))
    val ivs = Seq.fill(300) {
      val lo = rnd.nextInt(1000).toLong
      (rnd.nextInt(8).toLong, lo, lo + rnd.nextInt(120).toLong,
        rnd.nextInt())
    }
    val pdf = ps.toDF("k", "t", "pid")
    val idf = ivs.toDF("k", "lo", "hi", "iid")
    val sweep = ExtendedOps.bandJoin(pdf, idf, Seq("k"), "t", "lo", "hi")
      .select($"pid", $"iid").as[(Int, Int)].collect().sorted.toSeq
    val theta = pdf.join(idf,
      pdf("k") === idf("k") && pdf("t") >= idf("lo") && pdf("t") < idf("hi"))
      .select(pdf("pid"), idf("iid")).as[(Int, Int)]
      .collect().sorted.toSeq
    assert(sweep == theta)
  }

  test("timestamp band join agrees with the theta join on events") {
    val e = Tables(spark, sfDir).events
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), $"ts")
    val windows = e.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("c_id"),
        $"ts".as("lo"), ($"ts" + expr("INTERVAL 30 MINUTE")).as("hi"))
    val sweep = ExtendedOps.bandJoin(
      purchases, windows, Seq("user_id"), "ts", "lo", "hi")
      .select($"p_id", $"c_id").as[(Long, Long)].collect().sorted.toSeq
    val theta = purchases.join(windows,
      purchases("user_id") === windows("user_id") &&
        purchases("ts") >= windows("lo") && purchases("ts") < windows("hi"))
      .select($"p_id", $"c_id").as[(Long, Long)].collect().sorted.toSeq
    assert(sweep.nonEmpty && sweep == theta)
  }
}
