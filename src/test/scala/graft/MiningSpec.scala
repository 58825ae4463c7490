package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pattern-mining / linkage / inference operators (queries.Mining).
  * Value-level equivalence goes through the DuckDB gate (q205-q209);
  * these pin the algorithmic invariants the gate can't see. */
class MiningSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("basket lift: confidence >= support, lift consistent with both") {
    val r = queries.Mining.queries("q205_basket_lift")(spark, sfDir)
      .collect()
    assert(r.nonEmpty)
    for (row <- r) {
      val sup = row.getAs[Double]("support")
      val conf = row.getAs[Double]("confidence")
      assert(conf >= sup - 1e-9, s"confidence < support in $row")
      assert(sup > 0 && conf <= 1.0 + 1e-9)
    }
  }

  test("fuzzy link: every dirty record recovers its true source") {
    val r = queries.Mining.queries("q206_fuzzy_link")(spark, sfDir)
    // one deterministic substitution per name => distance is <= 1, the
    // pigeonhole blocking guarantees the true pair is always a
    // candidate, so self_found must hold for EVERY record (the
    // no-false-negative property of the segment filter)
    assert(r.where(!col("self_found")).count() == 0)
    assert(r.where(col("min_dist") > 1).count() == 0)
    assert(r.count() == Tables(spark, sfDir).part.count())
  }

  test("scd2: exactly one current version per user, intervals chain") {
    val h = queries.Mining.queries("q207_scd2_history")(spark, sfDir)
    val users = Tables(spark, sfDir).events
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(h.where(col("is_current")).count() == users)
    // within a user, valid_to of version v equals valid_from of v+1
    val chained = h.as("a").join(h.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.version") + 1 === col("b.version"))
      .where(col("a.valid_to") =!= col("b.valid_from"))
    assert(chained.count() == 0)
  }

  test("triangles: lcc bounded by [0,1], triangle nodes have deg >= 2") {
    val r = queries.Mining.queries("q208_triangles")(spark, sfDir)
      .collect()
    for (row <- r) {
      val lcc = row.getAs[Double]("lcc")
      assert(lcc >= 0.0 && lcc <= 1.0 + 1e-9, s"lcc out of range: $row")
      assert(row.getAs[Long]("deg") >= 2)
    }
  }

  test("markov: outgoing transition probabilities sum to 1 per state") {
    val r = queries.Mining.queries("q210_markov_transitions")(spark, sfDir)
    val sums = r.groupBy(col("from_type"))
      .agg(sum(col("p")).as("s")).collect()
    for (row <- sums)
      assert(math.abs(row.getAs[Double]("s") - 1.0) < 1e-4,
        s"row sum != 1: $row")
  }

  test("kaplan-meier: survival starts <= 1 and never increases") {
    val r = queries.Mining.queries("q211_kaplan_meier")(spark, sfDir)
      .orderBy(col("t")).collect()
    assert(r.nonEmpty)
    var prev = 1.0
    for (row <- r) {
      val s = row.getAs[Double]("survival")
      assert(s <= prev + 1e-9, s"survival increased at $row")
      prev = s
    }
    // at-risk counts are non-increasing in t as well
    val atRisk = r.map(_.getAs[Long]("n_at_risk"))
    assert(atRisk.sameElements(atRisk.sorted.reverse))
  }

  test("attribution: per-purchase shares sum to the purchase count") {
    val r = queries.Mining.queries("q212_decay_attribution")(spark, sfDir)
      .agg(sum(col("credit"))).head().getDouble(0)
    // every attributed purchase hands out exactly 1.0 of credit, so
    // total credit == number of purchases with at least one touch
    val ev = Tables(spark, sfDir).events
    val touches = ev.where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts").as("tts"))
    val attributed = ev.where(col("event_type") === "purchase").as("p")
      .join(touches, Seq("user_id"))
      .where(col("tts") < col("ts") &&
        col("tts") >= col("ts") - expr("INTERVAL 7 DAYS"))
      .select(col("event_id")).distinct().count()
    assert(math.abs(r - attributed) < 1e-3,
      s"total credit $r != attributed purchases $attributed")
  }

  test("GRAFT SKEW reports a uniform key as ~1 and a hot key as >> 1") {
    import spark.implicits._
    (1L to 1000L).map(i => (i % 100, i)).toDF("k", "v")
      .createOrReplaceTempView("skew_uniform")
    val u = spark.sql("GRAFT SKEW skew_uniform KEY k").head()
    assert(math.abs(u.getAs[Double]("skew_factor") - 1.0) < 1e-9)
    (1L to 1000L).map(i => (if (i <= 901) 0L else i, i)).toDF("k", "v")
      .createOrReplaceTempView("skew_hot")
    val h = spark.sql("GRAFT SKEW skew_hot KEY k").head()
    assert(h.getAs[Double]("skew_factor") > 50.0,
      s"hot key not detected: $h")
    assert(h.getAs[Long]("max_cnt") == 901L)
  }

  test("item CF: top-3 per item, scores non-increasing, no self-recs") {
    val r = queries.Mining.queries("q218_item_cf")(spark, sfDir)
    assert(r.where(col("item") === col("rec")).count() == 0)
    assert(r.groupBy(col("item")).count()
      .where(col("count") > 3).count() == 0)
    val bad = r.as("a").join(r.as("b"),
      col("a.item") === col("b.item") &&
        col("a.rk") + 1 === col("b.rk"))
      .where(col("a.sim") < col("b.sim"))
    assert(bad.count() == 0, "similarity not non-increasing in rank")
  }

  test("z-test: antisymmetric in the pair order, zero for equal rates") {
    val s = Seq(("a", 100L, 50L), ("b", 100L, 50L), ("c", 100L, 80L))
      .toDF("source", "n", "k")
    s.createOrReplaceTempView("zt")
    // replicate the q209 arithmetic on a fixture: equal rates => z = 0
    val z = spark.sql(
      """SELECT a.source, b.source,
        |  (CAST(a.k AS DOUBLE)/a.n - CAST(b.k AS DOUBLE)/b.n) /
        |  SQRT((CAST(a.k+b.k AS DOUBLE)/(a.n+b.n)) *
        |    (1 - CAST(a.k+b.k AS DOUBLE)/(a.n+b.n)) * (1.0/a.n + 1.0/b.n))
        |    AS z
        |FROM zt a JOIN zt b ON a.source < b.source
        |ORDER BY 1, 2""".stripMargin).collect()
    assert(math.abs(z(0).getDouble(2)) < 1e-12) // a vs b: equal rates
    assert(z(1).getDouble(2) < -1.96) // a vs c: c converts far better
  }
}
