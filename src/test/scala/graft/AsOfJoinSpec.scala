package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, ExtendedOps}

/** The custom physical as-of join (AsOfJoinPlan/Strategy/Exec) and the
  * connected-components operator. */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val probe = Seq(
    (1L, ts("2024-01-01 10:00:00"), "p1"),
    (1L, ts("2024-01-01 12:00:00"), "p2"),
    (2L, ts("2024-01-01 09:00:00"), "p3"),
    (3L, ts("2024-01-01 09:00:00"), "p4"))
    .toDF("k", "t", "pname")
  private val ref = Seq(
    (1L, ts("2024-01-01 09:30:00"), 100.0),
    (1L, ts("2024-01-01 11:00:00"), 200.0),
    (1L, ts("2024-01-01 12:00:00"), 250.0), // tie: at-or-before includes ==
    (2L, ts("2024-01-01 09:30:00"), 300.0), // after p3: no match
    (4L, ts("2024-01-01 01:00:00"), 400.0)) // key absent from probe
    .toDF("k", "t", "refval")

  test("asofJoinExec semantics: latest at-or-before per key, else null") {
    val out = ExtendedOps.asofJoinExec(
      probe, ref, keyCols = Seq("k"), ordCol = "t")
      .orderBy("k", "t")
      .select("pname", "refval")
      .as[(String, Option[Double])].collect().toSeq
    assert(out == Seq(
      ("p1", Some(100.0)),
      ("p2", Some(250.0)),
      ("p3", None),
      ("p4", None)))
  }

  test("the plan actually runs the custom exec") {
    val df = ExtendedOps.asofJoinExec(
      probe, ref, keyCols = Seq("k"), ordCol = "t")
    df.collect() // finalize the adaptive plan
    // AQE wraps the physical plan, so look at the final plan's string
    // rather than traversing the pre-execution tree
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      df.queryExecution.executedPlan.toString)
  }

  test("asofJoinExec agrees with the declarative asofAlign") {
    val viaExec = ExtendedOps.asofJoinExec(
      probe, ref, keyCols = Seq("k"), ordCol = "t")
    val viaWindow = ExtendedOps.asofAlign(
      probe, ref.withColumnRenamed("refval", "rv"),
      keyCols = Seq("k"), ordCols = Seq("t"),
      payload = Map("rv" -> "refval"))
    assert(viaExec.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaExec).isEmpty)
  }

  test("self-lineage as-of (probe and ref from one table) works") {
    val ev = probe.withColumnRenamed("pname", "tag")
    val out = ExtendedOps.asofJoinExec(
      ev.where(col("k") === 1L),
      ev.select(col("k"), col("t"), col("tag").as("prev_tag")),
      keyCols = Seq("k"), ordCol = "t")
    assert(out.count() == 2)
  }

  test("connectedComponents labels chains and isolates components") {
    // chain 1-2-3-4 plus pair 10-11: two components
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a", "b")
    val comp = DedupOps.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }
}
