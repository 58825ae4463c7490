package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{EmbeddedDerby, ExternalLocations}

/** LIVE JDBC federation against embedded Apache Derby (the derby jars
  * ship on the Spark classpath): a real write/read round-trip through
  * Spark's jdbc source, a pushdown assertion (the filter must reach
  * the JDBCRelation scan as a PushedFilter — i.e. it becomes the
  * remote WHERE clause, the reference's core data-virtualization act,
  * dbms/driver/SqlDriver.scala), and the federated join query the
  * oracle gate checks (q231). */
class JdbcDerbySpec extends AnyFunSuite {
  import TestSession._

  private lazy val loc = {
    val l = EmbeddedDerby.location("spec_db", "nation")
    l.write(Tables(spark, sfDir).nation)
    l
  }

  test("write/read round-trip preserves rows and values") {
    val nation = Tables(spark, sfDir).nation
    val back = loc.read(spark)
    assert(back.count() == nation.count())
    // exact value round-trip, both directions
    assert(back.except(nation).isEmpty && nation.except(back).isEmpty)
  }

  test("filters push into the remote database (PushedFilters)") {
    val q = loc.read(spark).where(col("n_regionkey") === 1)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters:"), s"no pushdown marker in:\n$scan")
    assert(scan.contains("EqualTo(n_regionkey,1)") ||
      scan.contains("n_regionkey = 1"),
      s"region filter not pushed:\n$scan")
    assert(q.count() == 5) // 5 nations per region in TPC-H
  }

  test("registered location federates with parquet relations") {
    ExternalLocations.register("derby_nation", loc)
    val joined = ExternalLocations.table(spark, "derby_nation")
      .join(Tables(spark, sfDir).region,
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n"))
    assert(joined.count() == 5)
    assert(joined.collect().forall(_.getAs[Long]("n") == 5L))
    ExternalLocations.remove("derby_nation")
  }

  test("q231 federated query matches the all-parquet plan") {
    val viaDerby = SparkEntry.queries("q231_jdbc_federated")(spark, sfDir)
    val t = Tables(spark, sfDir)
    val allParquet = t.customer
      .join(t.nation, col("c_nationkey") === col("n_nationkey"))
      .where(col("n_regionkey") < 3)
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_cust"),
        (sum(col("c_acctbal").cast("decimal(38,6)")).cast("double"))
          .as("total_bal"))
      .orderBy(col("n_name"))
    assert(viaDerby.collect().toSeq == allParquet.collect().toSeq)
  }
}
