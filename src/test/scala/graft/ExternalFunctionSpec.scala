package graft

import org.scalatest.funsuite.AnyFunSuite

/** External scalar FUNCTION objects: GRAFT ADD/REMOVE/LIST FUNCTION
  * admin statements plus call-site splicing (the template must behave
  * as a native expression — usable in SELECT, WHERE, and GROUP BY of
  * ordinary SQL). */
class ExternalFunctionSpec extends AnyFunSuite {
  import TestSession._

  test("add, call, list, remove lifecycle") {
    val add = spark.sql("GRAFT ADD FUNCTION t_disc FROM tiered_discount")
      .collect().head
    assert(add.getAs[String]("status") == "added")

    val r = spark.sql(
      "SELECT CAST(t_disc(100.0, 5) AS DOUBLE) AS v").collect().head
    assert(math.abs(r.getAs[Double]("v") - 95.0) < 1e-9)
    // cap at 10 units
    val r2 = spark.sql(
      "SELECT CAST(t_disc(100.0, 50) AS DOUBLE) AS v").collect().head
    assert(math.abs(r2.getAs[Double]("v") - 90.0) < 1e-9)

    val listed = spark.sql("GRAFT LIST FUNCTIONS").collect()
      .map(_.getAs[String]("function"))
    assert(listed.contains("t_disc"))

    val rm = spark.sql("GRAFT REMOVE FUNCTION t_disc").collect().head
    assert(rm.getAs[String]("status") == "removed")
    assertThrows[Exception] {
      spark.sql("SELECT t_disc(1.0, 1)").collect()
    }
  }

  test("unknown provider is a hard error naming the catalog") {
    val e = intercept[IllegalArgumentException] {
      spark.sql("GRAFT ADD FUNCTION f FROM no_such_provider")
    }
    assert(e.getMessage.contains("tiered_discount"))
  }

  test("spliced template participates in WHERE and aggregation") {
    spark.sql("GRAFT ADD FUNCTION t_cell FROM geo_bucket")
    val rows = spark.sql(
      """SELECT t_cell(v * 10.0, v * 20.0) AS cell, COUNT(*) AS n
        |FROM (SELECT CAST(id AS DOUBLE) AS v FROM RANGE(10))
        |WHERE t_cell(v * 10.0, v * 20.0) >= 0
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(rows.nonEmpty)
    // id=3 -> lat 30, lon 60 -> 3*100 + 6 = 306
    assert(rows.map(_.getAs[Long]("cell")).contains(306L))
    spark.sql("GRAFT REMOVE FUNCTION t_cell")
  }

  test("binding state is scoped per session, not process-global") {
    import graft.functions.ExternalFunctions
    val other = spark.newSession()
    ExternalFunctions.add(other, "sess_only", "risk_score")
    try {
      // callable + listed in the session that bound it ...
      assert(ExternalFunctions.list(other).exists(_._1 == "sess_only"))
      // ... invisible to the sibling session's listing (its registry
      // never saw the binding, so the listing must not claim it)
      assert(!ExternalFunctions.list(spark).exists(_._1 == "sess_only"))
      assertThrows[Exception] {
        spark.sql("SELECT sess_only(1.0, 1.0)").collect()
      }
    } finally ExternalFunctions.clear(other)
  }

  test("q223 query returns one row per return flag") {
    val df = SparkEntry.queries("q223_ext_function")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length == 3) // A, N, R
    assert(rows.forall(_.getAs[Double]("disc_total") > 0))
  }

  test("randomstr: deterministic, alphanumeric, lambda splice works") {
    spark.sql("GRAFT ADD FUNCTION rstr FROM randomstr").collect()
    val a = spark.sql("SELECT rstr(42, 8) AS s").head.getString(0)
    val b = spark.sql("SELECT rstr(42, 8) AS s").head.getString(0)
    assert(a == b && a.length == 8 && a.matches("[A-Za-z0-9]+"))
    // different keys diverge; zero length is the empty string (the
    // sequence(0,-1) descent guard)
    assert(spark.sql("SELECT rstr(43, 8) AS s").head.getString(0) != a)
    assert(spark.sql("SELECT rstr(42, 0) AS s").head.getString(0) == "")
    // 1-arg reference signature: rand()-keyed, right shape/length
    val c = spark.sql("SELECT rstr(8) AS s").head.getString(0)
    assert(c.length == 8 && c.matches("[A-Za-z0-9]+"))
    assert(spark.sql("SELECT rstr(0) AS s").head.getString(0) == "")
    // an arity with no template is a hard error naming the options
    val e = intercept[Exception] {
      spark.sql("SELECT rstr(1, 2, 3) AS s").collect()
    }
    assert(e.getMessage.contains("1 or 2") ||
      Option(e.getCause).exists(_.getMessage.contains("1 or 2")))
  }

  test("date_partstr renders display names per style") {
    spark.sql("GRAFT ADD FUNCTION dps FROM date_partstr").collect()
    val r = spark.sql("SELECT " +
      "dps('SHORT', 'MONTH', DATE'1995-03-06') AS m1, " +
      "dps('LONG', 'MONTH', DATE'1995-03-06') AS m2, " +
      "dps('LONG', 'DAY_OF_WEEK', DATE'1995-03-06') AS d1, " +
      "dps('Q', 'QUARTER', DATE'1995-03-06') AS q1, " +
      "dps('SHORT', 'QUARTER', DATE'1995-03-06') AS q2, " +
      "dps('LONG', 'QUARTER', DATE'1995-03-06') AS q3").head
    assert(r.getString(0) == "Mar" && r.getString(1) == "March")
    assert(r.getString(2) == "Monday")
    // reference quarter styles (ScalFunctionEvaluator.scala:857):
    // SHORT 'Q1', LONG 'QUARTER1'; graft's 'Q' style aliases SHORT
    assert(r.getString(3) == "Q1" && r.getString(4) == "Q1")
    assert(r.getString(5) == "QUARTER1")
  }

  test("date_partstr: 2-arg default-SHORT form and the added parts") {
    spark.sql("GRAFT ADD FUNCTION dps2 FROM date_partstr").collect()
    val r = spark.sql("SELECT " +
      "dps2('MONTH', DATE'1995-03-06') AS m, " +
      "dps2('QUARTER', DATE'1995-03-06') AS q, " +
      "dps2('SHORT', 'WEEK_OF_MONTH', DATE'1995-03-06') AS wom, " +
      "dps2('SHORT', 'HOUR', TIMESTAMP'1995-03-06 14:30:45.123') AS h, " +
      "dps2('SHORT', 'MILLISECOND', " +
      "TIMESTAMP'1995-03-06 14:30:45.123') AS ms").head
    assert(r.getString(0) == "Mar" && r.getString(1) == "Q1")
    assert(r.getString(2) == "1") // day 6 -> first 7-day block
    assert(r.getString(3) == "14" && r.getString(4) == "123")
    spark.sql("GRAFT REMOVE FUNCTION dps2")
  }
}
