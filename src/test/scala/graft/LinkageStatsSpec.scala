package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Phonetic linkage (q272) and the classical-test statistics family
  * (q273 ANOVA, q274 Mann-Whitney). Value-level cross-engine checks go
  * through the DuckDB gate; these pin the algorithm invariants and the
  * known textbook values the gate can't see. */
class LinkageStatsSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("jaro-winkler: textbook values and conventions") {
    import graft.plans.JaroWinkler.sim
    assert(math.abs(sim("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(sim("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-12)
    assert(math.abs(sim("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(sim("ABC", "ABC") == 1.0)
    // DuckDB convention: either side empty -> 0.0 (even both empty)
    assert(sim("", "") == 0.0)
    assert(sim("", "A") == 0.0)
    assert(sim("XYZ", "ABC") == 0.0) // no matches
  }

  test("jaro-winkler: symmetric, bounded, boost only above 0.7") {
    import graft.plans.JaroWinkler.sim
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 500) {
      val a = rng.alphanumeric.take(rng.nextInt(10)).mkString
      val b = rng.alphanumeric.take(rng.nextInt(10)).mkString
      val s = sim(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(s == sim(b, a), s"asymmetric on $a / $b")
    }
  }

  test("q272: every best match is within its phonetic block and >= 0.85") {
    val r = queries.Mining.queries("q272_phonetic_link")(spark, sfDir)
      .collect()
    assert(r.nonEmpty)
    for (row <- r) {
      assert(row.getAs[Double]("jw") >= 0.85)
      assert(row.getAs[Long]("n_cand") >= 1L)
    }
  }

  test("GRAFT LINK statement lowers to the phoneticLink operator") {
    val t = Tables(spark, sfDir)
    t.registerAll()
    t.part.select(col("p_name").as("dn")).createOrReplaceTempView("ln_d")
    val viaSql = spark
      .sql("GRAFT LINK ln_d COL dn WITH part COL p_name MIN 85")
    val viaOp = graft.operators.LinkOps.phoneticLink(
      spark.table("ln_d"), "dn", t.part, "p_name", 0.85)
    assert(viaSql.collect().toSeq == viaOp.collect().toSeq)
    // uncorrupted names must self-match at jw = 1.0
    assert(viaSql.where(col("jw") =!= 1.0).count() == 0)
  }

  test("q273 anova: F matches a direct two-pass computation") {
    val docs = Tables(spark, sfDir).documents
      .select(col("source"), col("n_chars").cast("double").as("x"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val byG = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = docs.length
    val k = byG.size
    val grand = docs.map(_._2).sum / n
    val ssb = byG.values.map(v =>
      v.length * math.pow(v.sum / v.length - grand, 2)).sum
    val ssw = byG.values.map(v => {
      val m = v.sum / v.length; v.map(x => (x - m) * (x - m)).sum }).sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val row = queries.Stats.queries("q273_anova")(spark, sfDir).head()
    assert(row.getAs[Long]("k") == k)
    assert(row.getAs[Long]("n") == n)
    assert(math.abs(row.getAs[Double]("ssb") - ssb) < 1e-3 * (ssb.abs + 1))
    assert(math.abs(row.getAs[Double]("ssw") - ssw) < 1e-3 * (ssw.abs + 1))
    assert(math.abs(row.getAs[Double]("f") - f) < 1e-4 * (f.abs + 1))
  }

  test("q284 kruskal-wallis: H matches the brute-force midrank formula") {
    val docs = Tables(spark, sfDir).documents
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length
    // brute-force midranks
    val sorted = docs.map(_._2).sorted
    val rank = sorted.zipWithIndex.groupBy(_._1).view
      .mapValues(g => g.map(_._2 + 1).sum.toDouble / g.length).toMap
    val byG = docs.groupBy(_._1).view
      .mapValues(_.map(x => rank(x._2))).toMap
    val rr = byG.values.map(v => math.pow(v.sum, 2) / v.length).sum
    val h0 = 12.0 / (n.toDouble * (n + 1)) * rr - 3.0 * (n + 1)
    val tie = sorted.groupBy(identity).values
      .map(g => math.pow(g.length, 3) - g.length).sum
    val h = h0 / (1.0 - tie / (math.pow(n, 3) - n))
    val row = queries.Stats.queries("q284_kruskal_wallis")(spark, sfDir)
      .head()
    assert(row.getAs[Long]("n") == n)
    assert(math.abs(row.getAs[Double]("h") - h) < 1e-4 * (h.abs + 1),
      s"engine ${row.getAs[Double]("h")} vs brute $h")
  }

  test("q274 mann-whitney: U2 matches the brute-force rank definition") {
    val docs = Tables(spark, sfDir).documents
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val res = queries.Stats.queries("q274_mann_whitney")(spark, sfDir)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_s"), r.getAs[Long]("u2"), r.getAs[Double]("auc")))
      .toMap
    assert(res.size == docs.map(_._1).distinct.length)
    for ((src, (nS, u2, auc)) <- res) {
      val a = docs.filter(_._1 == src).map(_._2)
      val b = docs.filter(_._1 != src).map(_._2)
      assert(nS == a.length)
      // doubled brute-force U: 2 per win, 1 per tie
      var bf = 0L
      for (x <- a; y <- b) {
        if (x > y) bf += 2 else if (x == y) bf += 1
      }
      assert(u2 == bf, s"$src: u2=$u2 brute=$bf")
      val expAuc = bf.toDouble / (2.0 * a.length * b.length)
      assert(math.abs(auc - expAuc) < 1e-6)
    }
  }
}
