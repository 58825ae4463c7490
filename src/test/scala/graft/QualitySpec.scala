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
}
