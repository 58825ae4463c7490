package graft

import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

/** Incremental fetch through the graft JDBC driver (jdbc/
  * GraftDriver; reference modules/interfaces/jdbc): the ResultSet is
  * backed by Dataset.toLocalIterator, so reading k rows of a huge
  * result computes only the partitions those rows touch — the driver
  * JVM never materializes the whole result. */
class JdbcIncrementalFetchSpec extends AnyFunSuite {
  import TestSession._

  private def connect() = {
    val _ = spark // extension-wired session up before the driver grabs one
    graft.jdbc.GraftJdbc.ensureRegistered()
    DriverManager.getConnection(s"jdbc:graft:$sfDir")
  }

  test("a >1M-row result streams through next() with correct values") {
    val st = connect().createStatement()
    val rs = st.executeQuery(
      "SELECT id FROM range(0, 1500000) ORDER BY id")
    var n = 0L
    var sum = 0L
    while (rs.next()) { sum += rs.getLong(1); n += 1 }
    rs.close()
    assert(n == 1500000L)
    assert(sum == 1500000L * 1499999L / 2)
  }

  test("reading 5 rows of a 10^8-row query never builds the result") {
    // 100M rows over 400 slices = 250k rows/partition. A collect()
    // here would materialize ~100M Row objects (many GiB) before the
    // first next(); with toLocalIterator only the partitions behind
    // the first 5 rows are computed, so this finishes immediately.
    val st = connect().createStatement()
    val rs = st.executeQuery("SELECT id FROM range(0, 100000000, 1, 400)")
    var got = Seq.empty[Long]
    var k = 0
    while (k < 5 && rs.next()) { got :+= rs.getLong(1); k += 1 }
    rs.close()
    assert(got == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("setMaxRows caps the result AT THE PLAN, setFetchSize round-trips") {
    val st = connect().createStatement()
    st.setMaxRows(7)
    assert(st.getMaxRows == 7)
    st.setFetchSize(1000)
    assert(st.getFetchSize == 1000)
    val rs = st.executeQuery("SELECT id FROM range(0, 1000000)")
    var n = 0
    while (rs.next()) n += 1
    rs.close()
    assert(n == 7, s"setMaxRows(7) returned $n rows")
    // cap removed -> full result again
    st.setMaxRows(0)
    val rs2 = st.executeQuery("SELECT COUNT(*) AS n FROM " +
      "(SELECT id FROM range(0, 1000))")
    assert(rs2.next() && rs2.getLong(1) == 1000L)
    rs2.close()
  }
}
