package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources._

/** Named external locations read back as DataFrames; queries compose
  * over them unchanged. */
class ExternalLocationSpec extends AnyFunSuite {
  import TestSession._

  test("parquet/csv/json/text locations round-trip") {
    val t = Tables(spark, sfDir)
    val base = java.nio.file.Files
      .createTempDirectory("graft_extloc").toString
    t.nation.write.mode("overwrite")
      .option("header", "true").csv(s"$base/nation_csv")
    t.nation.write.mode("overwrite").json(s"$base/nation_json")
    t.documents.select(col("text")).write.mode("overwrite")
      .text(s"$base/docs_txt")

    ExternalLocations.register("nation_pq",
      ParquetLocation(s"$sfDir/nation.parquet"))
    ExternalLocations.register("nation_csv",
      CsvLocation(s"$base/nation_csv", schema = Some(t.nation.schema)))
    ExternalLocations.register("nation_json",
      JsonLocation(s"$base/nation_json", Some(t.nation.schema)))
    ExternalLocations.register("docs_txt", TextLocation(s"$base/docs_txt"))

    val n = t.nation.count()
    assert(ExternalLocations.table(spark, "nation_pq").count() == n)
    assert(ExternalLocations.table(spark, "nation_csv").count() == n)
    assert(ExternalLocations.table(spark, "nation_json").count() == n)
    assert(ExternalLocations.table(spark, "docs_txt").count() ==
      t.documents.count())

    // downstream operators compose over a location like any relation
    val joined = ExternalLocations.table(spark, "nation_csv")
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name")).agg(count(lit(1)).as("n"))
    assert(joined.count() == 5)
  }

  test("CREATE EXTERNAL materializes a query into a location") {
    Tables(spark, sfDir).registerAll()
    val base = java.nio.file.Files
      .createTempDirectory("graft_extwrite").toString
    ExternalLocations.register("fed_out", ParquetLocation(s"$base/out"))
    val st = spark.sql(
      """GRAFT CREATE EXTERNAL fed_out AS
        |SELECT r_name, count(*) AS n FROM nation
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin).collect().head
    assert(st.getAs[String]("status") == "created")
    val back = ExternalLocations.table(spark, "fed_out")
    assert(back.count() == 5)
    assert(back.agg(sum(col("n"))).head.getLong(0) == 25L)

    // the write side of the LIVE federation path: into embedded Derby
    ExternalLocations.register("fed_db",
      EmbeddedDerby.location("extwrite_db", "region_counts"))
    spark.sql("GRAFT CREATE EXTERNAL fed_db AS " +
      "SELECT r_regionkey, r_name FROM region")
    assert(ExternalLocations.table(spark, "fed_db").count() == 5)
    ExternalLocations.remove("fed_out")
    ExternalLocations.remove("fed_db")
  }

  test("jdbc location builds the reader; connecting fails cleanly here") {
    ExternalLocations.register("remote_db", JdbcLocation(
      "jdbc:postgresql://example.invalid:5432/db", "public.orders",
      Map("fetchsize" -> "1000")))
    // no PostgreSQL driver ships in this environment (live JDBC is
    // exercised against embedded Derby in JdbcDerbySpec) — the read
    // must fail with a clear error, not hang or return garbage
    val e = intercept[Exception] {
      ExternalLocations.table(spark, "remote_db").count()
    }
    assert(e != null)
  }

  test("unknown location names error with the registry listing") {
    val e = intercept[IllegalArgumentException] {
      ExternalLocations.table(spark, "nope")
    }
    assert(e.getMessage.contains("unknown external location"))
  }
}
