package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DedupOps, ExtendedOps, MLOps}

/** Semantic unit tests for the operator library on small hand-built
  * inputs (the oracle gate checks them at sf scale; these pin the
  * corner cases). */
class OperatorsSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofAlign attaches latest prior ref and null when none") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"))
      .toDF("k", "t", "pname")
    val ref = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 200.0),
      (2L, ts("2024-01-01 09:30:00"), 300.0))
      .toDF("k", "t", "refval")
    val out = ExtendedOps.asofAlign(
      probe, ref, Seq("k"), Seq("t"), Map("refval" -> "last_ref"))
      .orderBy("pname").collect()
    assert(out.map(r => Option(r.getAs[Any]("last_ref"))).toSeq ==
      Seq(Some(100.0), Some(200.0), None))
  }

  test("asofAlign MARGIN nulls out refs beyond the distance bound") {
    val probe = Seq((1L, ts("2024-01-01 12:00:00"), "p1"))
      .toDF("k", "t", "pname")
    val ref = Seq((1L, ts("2024-01-01 09:00:00"), 7.0))
      .toDF("k", "t", "refval")
    def gapSecs(p: org.apache.spark.sql.Column,
        r: org.apache.spark.sql.Column) =
      unix_timestamp(p) - unix_timestamp(r)
    val near = ExtendedOps.asofAlign(probe, ref, Seq("k"), Seq("t"),
      Map("refval" -> "lr"), marginOpt = Some(4 * 3600L),
      marginExpr = Some(gapSecs)).collect()
    assert(near.head.getAs[Double]("lr") == 7.0)
    val far = ExtendedOps.asofAlign(probe, ref, Seq("k"), Seq("t"),
      Map("refval" -> "lr"), marginOpt = Some(3600L),
      marginExpr = Some(gapSecs)).collect()
    assert(far.head.isNullAt(far.head.fieldIndex("lr")))
  }

  test("disjointIntervals splits overlap into elementary segments") {
    val iv = Seq((1L, 10, 0, 10), (1L, 11, 5, 15))
      .toDF("k", "id", "lo", "hi")
    val out = ExtendedOps.disjointIntervals(iv, "k", "lo", "hi")
      .select("id", "out_lo", "out_hi")
      .orderBy("id", "out_lo")
      .as[(Int, Int, Int)].collect().toSeq
    // boundaries 0,5,10,15 → segments (0,5)(5,10)(10,15);
    // interval 10 covers first two, interval 11 covers last two
    assert(out == Seq((10, 0, 5), (10, 5, 10), (11, 5, 10), (11, 10, 15)))
  }

  test("sessionize splits on gap and counts per session") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),
      (1L, ts("2024-01-01 11:30:00"), 3L), // 80 min gap → new session
      (2L, ts("2024-01-01 10:00:00"), 4L))
      .toDF("user_id", "ts", "event_id")
    val out = ExtendedOps.sessionize(ev, "user_id", "ts", "event_id", 1800L)
      .groupBy("user_id", "session_id").count()
      .orderBy("user_id", "session_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("minhash LSH finds identical token-set docs, prunes mega-buckets") {
    val docs = (Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "zeta epsilon delta gamma beta alpha"), // same set, shuffled
      (3L, "one two three four five six"),
      (4L, "seven eight nine ten eleven twelve"))
      ).toDF("doc_id", "text")
    val sigs = DedupOps.minhashSignature(docs, "text", k = 32)
    val cands = DedupOps.minhashCandidates(sigs, "doc_id", 32, 8)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
    val verified = DedupOps.verifyJaccard(
      cands.toSeq.toDF("doc_a", "doc_b"), docs, "doc_id", "text")
      .where($"doc_a" === 1 && $"doc_b" === 2)
      .select("jaccard").as[Double].head()
    assert(verified == 1.0)
  }

  test("simhash identical sets collide at hamming 0") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"),
      (3L, "unrelated words entirely different"))
      .toDF("doc_id", "text")
    val hashed = DedupOps.simhash(docs, "doc_id", "text")
    val pairs = DedupOps.simhashPairs(hashed, "doc_id", maxHamming = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("rangeJoin: boundaries, multi-bucket spans, overlaps, misses") {
    val points = Seq((1L, 0.0), (2L, 9.999), (3L, 10.0), (4L, 25.0),
      (5L, 99.0), (6L, 1000.0)).toDF("pid", "v")
    val intervals = Seq(
      ("a", 0.0, 10.0),    // pid 1, 2 (10.0 exclusive)
      ("b", 10.0, 50.0),   // pid 3, 4 — spans several width-7 buckets
      ("c", 20.0, 30.0),   // pid 4 again (overlap)
      ("d", 90.0, 100.0))  // pid 5
      .toDF("iv", "lo", "hi")
    val out = ExtendedOps.rangeJoin(points, intervals, "v", "lo", "hi",
      width = 7.0)
      .select("pid", "iv").as[(Long, String)].collect().toSet
    assert(out == Set((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"),
      (4L, "c"), (5L, "d")))

    // empty/inverted intervals match nothing (and must not trip
    // sequence()'s descending-range behavior)
    val degenerate = intervals.unionAll(
      Seq(("e", 50.0, 50.0), ("f", 60.0, 40.0)).toDF("iv", "lo", "hi"))
    val out2 = ExtendedOps.rangeJoin(points, degenerate, "v", "lo", "hi",
      width = 7.0).select("pid", "iv").as[(Long, String)].collect().toSet
    assert(out2 == out)
  }

  test("saltedJoin works on a key-only big side") {
    val bigDf = (Seq.fill(20)("hot") ++ Seq("cold")).toDF("k")
    val smallDf = Seq(("hot", 1), ("cold", 2)).toDF("k", "tag")
    val out = ExtendedOps.saltedJoin(bigDf, smallDf, Seq("k"), salts = 4)
    assert(out.count() == 21)
    assert(out.groupBy(col("k")).count().where(col("k") === "hot")
      .collect()(0).getLong(1) == 20)
  }

  test("saltedJoin equals plain join and spreads the hot key") {
    val big = (1 to 500).map(i => ("hot", i.toLong)) ++
      (1 to 10).map(i => ("cold", i.toLong))
    val bigDf = big.toDF("k", "v")
    val smallDf = Seq(("hot", "H"), ("cold", "C"), ("unused", "U"))
      .toDF("k", "tag")
    val out = ExtendedOps.saltedJoin(bigDf, smallDf, Seq("k"), salts = 8)
    val plain = bigDf.join(smallDf, Seq("k"))
    assert(out.count() == 510)
    assert(out.exceptAll(plain).isEmpty && plain.exceptAll(out).isEmpty)
    // the hot key's rows really land on multiple salt values
    val saltSpread = bigDf.where(col("k") === "hot")
      .select(pmod(hash(col("v")), lit(8)).as("s"))
      .distinct().count()
    assert(saltSpread > 4)
  }

  test("nearest-centroid assigns to own cluster on separated data") {
    val vecs = Seq(
      (1L, Array(10.0f, 0.0f), 0),
      (2L, Array(11.0f, 1.0f), 0),
      (3L, Array(0.0f, 10.0f), 1),
      (4L, Array(1.0f, 11.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = MLOps.centroids(vecs, "label")
    val out = MLOps.assign(vecs, cents)
      .select("vec_id", "c_label").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1))
  }
}
