package graft

import org.scalatest.funsuite.AnyFunSuite

/** The extensions path: a session built by Engine.session (as the
  * shared TestSession is) has the graft native functions available
  * directly in SQL — no per-query registration. */
class EngineSpec extends AnyFunSuite {
  import TestSession._

  test("graft extensions expose native functions to SQL") {
    val one = spark.sql(
      "SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
    val fp = spark.sql(
      "SELECT graft_fingerprint('abc') AS fp").collect()(0).getLong(0)
    // ((0*31+97)*31+98)*31+99
    assert(fp == ((97L * 31 + 98) * 31 + 99))
    val ic = spark.sql(
      """SELECT graft_sorted_intersect_count(
        |  array('a','b','c'), array('b','c','d')) AS n""".stripMargin)
      .collect()(0).getInt(0)
    assert(ic == 2)
  }
}
