package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Java binding facade: session wrap, table registration, SQL +
  * GRAFT dialect execution, list collection — all through the
  * Java-facing types (no Scala implicits/defaults). */
class JavaApiSpec extends AnyFunSuite {
  import TestSession._

  test("java facade runs SQL and GRAFT statements") {
    val g = graft.javaapi.Graft.wrap(spark).registerTables(sfDir)
    assert(g.session() eq spark)

    val regions = g.sqlToList("SELECT r_name FROM region ORDER BY r_name")
    assert(regions.size() == 5)
    assert(regions.get(0).getString(0) == "AFRICA")

    // the GRAFT dialect flows through the same entry point
    val skew = g.sql("GRAFT SKEW lineitem KEY l_orderkey")
    assert(skew.columns.contains("skew_factor"))
    assert(skew.count() == 1)
  }
}
