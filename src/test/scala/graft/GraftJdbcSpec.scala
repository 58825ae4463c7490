package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

/** The engine's OWN JDBC driver surface: a plain java.sql client
  * (DriverManager -> Connection -> Statement -> ResultSet) running
  * Spark SQL and GRAFT statements against the session. */
class GraftJdbcSpec extends AnyFunSuite {
  import TestSession._

  test("DriverManager round trip over jdbc:graft:") {
    val _ = spark // session up before the driver looks for one
    graft.jdbc.GraftJdbc.ensureRegistered()
    val conn = DriverManager.getConnection(s"jdbc:graft:$sfDir")
    try {
      assert(conn.isValid(1) && conn.getCatalog == "graft")
      val st = conn.createStatement()
      val rs = st.executeQuery(
        "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
      val md = rs.getMetaData
      assert(md.getColumnCount == 2)
      assert(md.getColumnName(2) == "r_name")
      assert(md.getColumnType(2) == java.sql.Types.VARCHAR)
      val names = Iterator.continually(rs)
        .takeWhile(_.next()).map(_.getString("r_name")).toList
      assert(names.head == "AFRICA" && names.length == 5)
      rs.close(); st.close()
    } finally conn.close()
    assert(conn.isClosed)
  }

  test("GRAFT dialect statements flow through the JDBC surface") {
    graft.jdbc.GraftJdbc.ensureRegistered()
    val conn = DriverManager.getConnection(s"jdbc:graft:$sfDir")
    try {
      val rs = conn.createStatement().executeQuery(
        "GRAFT SKEW lineitem KEY l_orderkey")
      assert(rs.next())
      assert(rs.getLong("n_keys") > 0)
      assert(rs.getDouble("skew_factor") >= 1.0)
      assert(!rs.next())
    } finally conn.close()
  }

  test("unsupported java.sql surface fails loudly, nulls tracked") {
    graft.jdbc.GraftJdbc.ensureRegistered()
    val conn = DriverManager.getConnection(s"jdbc:graft:$sfDir")
    try {
      intercept[java.sql.SQLFeatureNotSupportedException] {
        conn.prepareCall("ANY")
      }
      val rs = conn.createStatement().executeQuery(
        "SELECT CAST(NULL AS STRING) AS s, 1 AS one")
      assert(rs.next())
      assert(rs.getString("s") == null && rs.wasNull())
      assert(rs.getInt("one") == 1 && !rs.wasNull())
    } finally conn.close()
  }
}
