package graft

import org.scalatest.funsuite.AnyFunSuite

/** Value checks for the corpus-quality family beyond the oracle gate's
  * hash compare: cross-grain consistency of the datasheet rollup. */
class QualitySpec extends AnyFunSuite {
  import TestSession._

  test("q319: JSD bounded by ln 2, complete pair set, identity at zero") {
    val rows = SparkEntry.queries("q319_js_divergence")(spark, sfDir)
      .collect()
    val nSrc = Tables(spark, sfDir).documents
      .select(org.apache.spark.sql.functions.col("source"))
      .distinct().count()
    assert(rows.length.toLong == nSrc * (nSrc - 1) / 2,
      s"expected all ${nSrc * (nSrc - 1) / 2} pairs, got ${rows.length}")
    for (r <- rows) {
      val jsd = r.getAs[Double]("jsd")
      assert(jsd >= 0.0 && jsd <= math.log(2.0) + 1e-12,
        s"JSD out of [0, ln 2]: $jsd")
      assert(math.abs(r.getAs[Double]("js_distance")
        - math.sqrt(jsd)) < 1e-7)
      // real corpora from the same generator: close but NOT identical
      assert(jsd > 0.0)
    }
  }

  test("datasheet grand total equals the sum of per-lang rows (q198)") {
    val rows = SparkEntry.queries("q198_corpus_datasheet")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    val all = rows.filter { case (l, s, _, _) => l == "<all>" && s == "<all>" }
    assert(all.length == 1)
    val perLang = rows.filter { case (l, s, _, _) => l != "<all>" && s == "<all>" }
    val perSrc = rows.filter { case (l, s, _, _) => l == "<all>" && s != "<all>" }
    assert(perLang.nonEmpty && perSrc.nonEmpty)
    assert(perLang.map(_._3).sum == all.head._3, "per-lang docs != total")
    assert(perSrc.map(_._3).sum == all.head._3, "per-source docs != total")
    assert(perLang.map(_._4).sum == all.head._4, "per-lang tokens != total")
    assert(perSrc.map(_._4).sum == all.head._4, "per-source tokens != total")
  }

  test("window dedup: fractions bounded, short docs emit no windows") {
    import org.apache.spark.sql.functions.{col, size => asize}
    val rows = SparkEntry.queries("q232_window_dedup")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_windows"); val d = r.getAs[Long]("n_dup_windows")
      assert(n > 0 && d >= 0 && d <= n)
      val f = r.getAs[Double]("dup_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
    // docs under the 12-token window size must be absent, not zero-row
    val shortDocs = Tables(spark, sfDir).documents
      .select(col("doc_id"),
        asize(graft.functions.TextFunctions.regexTokens(col("text")))
          .as("n"))
      .where(col("n") < 12).collect().map(_.getLong(0)).toSet
    val emitted = rows.map(_.getLong(0)).toSet
    assert(shortDocs.intersect(emitted).isEmpty)
  }

  test("temperature mix: weights normalize, low-resource langs upsampled") {
    val rows = SparkEntry.queries("q233_temperature_mix")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Double]("share"), r.getAs[Double]("weight"),
        r.getAs[Double]("boost")))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-4, "weights sum != 1")
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-4, "shares sum != 1")
    // sqrt temperature flattens: smaller share => strictly larger boost
    val byShare = rows.sortBy(_._1)
    byShare.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._3 >= hi._3,
        s"boost not anti-monotone in share: $lo vs $hi")
    }
  }

  test("checkRules on an empty table reports 0 violations, passed=true") {
    import org.apache.spark.sql.functions.col
    val empty = spark.range(0).selectExpr("CAST(id AS DOUBLE) AS v")
    val rows = graft.operators.ProfileOps.checkRules(empty,
      Seq("v_nonneg" -> (col("v") >= 0), "v_small" -> (col("v") < 10)))
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == 0L)
      assert(r.getAs[Long]("n_violations") == 0L)
      assert(r.isNullAt(r.fieldIndex("violation_rate")),
        "0/0 rate must be null, not NaN")
      assert(r.getAs[Boolean]("passed"))
    }
  }
}
