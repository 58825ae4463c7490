package graft

import org.scalatest.funsuite.AnyFunSuite

/** Value checks for the corpus-quality family beyond the oracle gate's
  * hash compare: cross-grain consistency of the datasheet rollup. */
class QualitySpec extends AnyFunSuite {
  import TestSession._

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
