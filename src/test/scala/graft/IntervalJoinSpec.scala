package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ExtendedOps

/** Semantics of the grid-binned interval-overlap join: reference-cell
  * dedup must emit each overlapping pair EXACTLY once no matter how
  * many grid cells the pair shares, and the result must equal the
  * brute-force theta join. */
class IntervalJoinSpec extends AnyFunSuite {
  import TestSession._

  private def mk(rows: Seq[(Long, Double, Double)], id: String,
      lo: String, hi: String) = {
    import spark.implicits._
    rows.toDF(id, lo, hi)
  }

  test("equals brute-force theta join, one row per pair") {
    // spans from sub-cell to many-cell (width 10): overlap at cell
    // boundaries, touching endpoints (half-open: NOT a match), nested
    // and disjoint intervals
    val l = mk(Seq((1L, 0.0, 25.0), (2L, 9.0, 11.0), (3L, 40.0, 41.0),
      (4L, 50.0, 90.0), (5L, 5.0, 5.0)), "l_id", "l_lo", "l_hi")
    val r = mk(Seq((10L, 20.0, 60.0), (11L, 0.0, 9.0), (12L, 41.0, 42.0),
      (13L, 89.0, 130.0)), "r_id", "r_lo", "r_hi")
    val got = ExtendedOps
      .intervalOverlapJoin(l, r, Seq.empty, "l_lo", "l_hi", "r_lo",
        "r_hi", 10.0)
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toList
    // half-open semantics: an empty interval [x, x) contains no
    // points and overlaps nothing — the raw theta predicate alone
    // would spuriously match it (this is why row 5 is in the data)
    val want = l.crossJoin(r)
      .where(col("l_hi") > col("l_lo") && col("r_hi") > col("r_lo") &&
        col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
      .select(col("l_id"), col("r_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toList
    assert(got.sorted == want.sorted) // list compare => dup detection
    assert(got.nonEmpty)
  }

  test("keyed overlap joins only within the key") {
    import spark.implicits._
    val l = Seq((1, 100L, 0.0, 100.0), (2, 101L, 0.0, 100.0))
      .toDF("k", "l_id", "l_lo", "l_hi")
    val r = Seq((1, 200L, 50.0, 60.0)).toDF("k", "r_id", "r_lo", "r_hi")
    val got = ExtendedOps
      .intervalOverlapJoin(l, r, Seq("k"), "l_lo", "l_hi", "r_lo",
        "r_hi", 25.0)
      .select(col("l_id"), col("r_id")).collect()
    assert(got.map(x => (x.getLong(0), x.getLong(1))).toSet
      == Set((100L, 200L)))
  }

  test("GRAFT OVERLAP front door (derived width) equals the API") {
    val sql = SparkEntry.queries("q202_overlap_sql")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val api = SparkEntry.queries("q201_interval_join")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(sql == api)
    assert(sql.nonEmpty)
  }

  test("q201 plan avoids nested-loop joins") {
    val p = SparkEntry.queries("q201_interval_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoop"),
      s"interval join planned as nested loop:\n$p")
  }

  test("derived WIDTH comes from a bounded sample, not a full scan") {
    import spark.implicits._
    val t = Tables(spark, sfDir)
    val iv = t.events
      .select(col("user_id"),
        col("ts").cast("long").cast("double").as("lo"),
        (col("ts").cast("long") + 600L).cast("double").as("hi"))
    // the probe plan must be LIMIT-bounded: the scan short-circuits
    // after sampleRows rows instead of reading both sides in full
    def probe(df: org.apache.spark.sql.DataFrame) = df
      .select((col("hi") - col("lo")).cast("double").as("_s")).limit(64)
    val probePlan = probe(iv).queryExecution.executedPlan.toString
    assert(probePlan.contains("CollectLimit") ||
      probePlan.contains("GlobalLimit"),
      s"width probe not limit-bounded:\n$probePlan")
    // sampled estimate within tolerance of the exact mean (spans here
    // are constant 600, so the sample must recover it exactly)
    val w = ExtendedOps.deriveOverlapWidth(
      iv, iv, "lo", "hi", "lo", "hi", sampleRows = 64)
    assert(math.abs(w - 600.0) < 1e-9, s"derived width $w")
    // non-constant spans: sampled mean within 50% of the exact mean
    val varied = (1 to 10000).map(i => (0.0, (i % 100 + 1) * 1.0))
      .toDF("lo", "hi")
    val exact = varied.agg(avg(col("hi") - col("lo")))
      .head().getDouble(0)
    val ws = ExtendedOps.deriveOverlapWidth(
      varied, varied, "lo", "hi", "lo", "hi", sampleRows = 1024)
    assert(ws > exact * 0.5 && ws < exact * 2.0,
      s"sampled width $ws vs exact mean $exact")
  }
}
