package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GENERIC federation lane (`GRAFT ATTACH JDBC '<url>' AS <cat>`)
  * proven against a SECOND live engine: DuckDB (test classpath),
  * resolved purely through the engine-profile SPI — no DuckDB-specific
  * code outside the registered dialect/profile. The same plan
  * assertions as the Derby suite (PushedAggregates / PushedJoins /
  * PushedTopN, result equality, write-back, NATIVE) demonstrate the
  * dialect layer is real, not Derby-shaped: two vendors with
  * different SQL spellings (FETCH FIRST vs LIMIT), schemas (APP vs
  * main), and identifier folding ride one lane. */
class GenericAttachSpec extends AnyFunSuite {
  import TestSession._

  private lazy val dbPath: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_duck_fed")
    s"$d/fed.duckdb"
  }
  private def url = s"jdbc:duckdb:$dbPath"

  /** Seed `df` as DuckDB table `name` over raw JDBC (the fixtures are
    * tens of rows; production writes go through the catalog's CTAS /
    * INSERT lane, proven in the write-back test below). */
  private def seed(name: String, df: DataFrame): Unit = synchronized {
    val rows = df.collect()
    val cols = df.schema.fields.map { f =>
      val t = f.dataType match {
        case org.apache.spark.sql.types.IntegerType => "INTEGER"
        case org.apache.spark.sql.types.LongType => "BIGINT"
        case d: org.apache.spark.sql.types.DecimalType =>
          s"DECIMAL(${d.precision},${d.scale})"
        case org.apache.spark.sql.types.DoubleType => "DOUBLE"
        case _ => "VARCHAR"
      }
      s"${f.name} $t"
    }.mkString(", ")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(s"CREATE OR REPLACE TABLE $name ($cols)")
      st.close()
      val ps = conn.prepareStatement(
        s"INSERT INTO $name VALUES (${df.schema.fields.map(_ => "?")
          .mkString(", ")})")
      rows.foreach { r =>
        for (i <- df.schema.fields.indices)
          ps.setObject(i + 1, r.get(i))
        ps.addBatch()
      }
      ps.executeBatch()
      ps.close()
    } finally conn.close()
  }

  private lazy val attached: Unit = {
    val t = Tables(spark, sfDir)
    seed("nation_fed", t.nation)
    seed("supplier_fed", t.supplier.select(
      col("s_suppkey"), col("s_name"), col("s_nationkey"),
      col("s_acctbal").cast("decimal(12,2)").as("s_acctbal")))
    val status = spark.sql(s"GRAFT ATTACH JDBC '$url' AS duckfed")
      .collect().head
    assert(status.getAs[String]("catalog") == "duckfed")
    assert(status.getAs[String]("status") == "attached")
  }

  test("GROUP BY + COUNT/SUM execute inside DuckDB (PushedAggregates)") {
    attached
    val q = spark.sql(
      "SELECT n_regionkey, COUNT(*) AS n FROM duckfed.main.nation_fed " +
        "GROUP BY n_regionkey ORDER BY n_regionkey")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregates:"), s"aggregate not pushed:\n$p")
    assert(p.contains("PushedGroupByExpressions:"),
      s"group-by not pushed:\n$p")
    val local = Tables(spark, sfDir).nation
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))
      .collect().map(r => (r.get(0).toString, r.getLong(1))).toSeq
    val fed = q.collect()
      .map(r => (r.get(0).toString, r.getLong(1))).toSeq
    assert(fed == local)
  }

  test("same-source join collapses into ONE remote DuckDB query") {
    attached
    val q = spark.sql(
      """SELECT n.n_name, COUNT(*) AS n_supp,
        |  CAST(MIN(s.s_acctbal) AS DOUBLE) AS min_bal
        |FROM duckfed.main.supplier_fed s
        |JOIN duckfed.main.nation_fed n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedJoins:"), s"join not pushed:\n$p")
    assert(p.contains("PushedAggregates:"),
      s"aggregate did not compose over the pushed join:\n$p")
    val scans = "Scan JDBC".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 remote scan, saw $scans:\n$p")
    val t = Tables(spark, sfDir)
    val local = t.supplier
      .withColumn("s_acctbal", col("s_acctbal").cast("decimal(12,2)"))
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_supp"),
        min(col("s_acctbal")).cast("double").as("min_bal"))
      .orderBy(col("n_name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    val fed = q.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fed == local)
  }

  test("ORDER BY + LIMIT execute inside DuckDB (PushedTopN) with cap") {
    attached
    val q = spark.table("duckfed.main.supplier_fed")
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      .select(col("s_suppkey"), col("s_acctbal"))
      .limit(5)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedTopN:"), s"top-k not pushed:\n$p")
    val rows = q.collect()
    assert(rows.length == 5, "pushed TopN lost its row cap")
    val local = Tables(spark, sfDir).supplier
      .withColumn("s_acctbal", col("s_acctbal").cast("decimal(12,2)"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      .select(col("s_suppkey"), col("s_acctbal"))
      .limit(5).collect()
    assert(rows.map(_.toString).toSeq == local.map(_.toString).toSeq)
  }

  test("write-back: CTAS + INSERT land IN DuckDB and read back") {
    attached
    spark.sql("DROP TABLE IF EXISTS duckfed.main.wb_regions")
    spark.sql(
      """CREATE TABLE duckfed.main.wb_regions AS
        |SELECT n_regionkey, COUNT(*) AS n FROM duckfed.main.nation_fed
        |GROUP BY n_regionkey""".stripMargin)
    spark.sql(
      "INSERT INTO duckfed.main.wb_regions VALUES (999, 0)")
    // verify over RAW jdbc — no Spark catalog in the loop
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT COUNT(*), SUM(n) FROM wb_regions")
      assert(rs.next())
      assert(rs.getLong(1) == 6L) // 5 regions + sentinel
      assert(rs.getLong(2) == 25L)
    } finally conn.close()
  }

  test("GRAFT NATIVE runs vendor DDL at EXECUTION, not at parse") {
    attached
    spark.sql("GRAFT NATIVE duckfed 'DROP TABLE IF EXISTS native_t'")
    // EXPLAIN of a NATIVE statement must NOT execute it
    spark.sql(
      "GRAFT EXPLAIN GRAFT NATIVE duckfed " +
        "'CREATE TABLE native_t (i INTEGER)'").collect()
    val conn0 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn0.getMetaData.getTables(null, "main", "native_t", null)
      assert(!rs.next(), "EXPLAIN executed the NATIVE statement")
    } finally conn0.close()
    // executing it does create the table, and an UPDATE reports rows
    spark.sql(
      "GRAFT NATIVE duckfed 'CREATE TABLE native_t (i INTEGER)'")
      .collect()
    spark.sql(
      "GRAFT NATIVE duckfed 'INSERT INTO native_t VALUES (1), (2)'")
      .collect()
    val st = spark.sql(
      "GRAFT NATIVE duckfed 'UPDATE native_t SET i = i + 1'")
      .collect().head
    assert(st.getAs[String]("status") == "executed")
    assert(st.getAs[String]("update_count") == "2")
    // a result-set statement is FLAGGED, not silently discarded
    val sel = spark.sql(
      "GRAFT NATIVE duckfed 'SELECT * FROM native_t'").collect().head
    assert(sel.getAs[String]("status") == "returned_result_set")
    assert(sel.getAs[String]("update_count") == "2")
  }

  test("Derby resolves through the SAME generic JDBC lane") {
    val t = Tables(spark, sfDir)
    graft.sources.FederatedPushdown.seedOnce(spark, "spec_genlane_db",
      "NAT_GEN", t.nation)
    val derbyUrl = graft.sources.EmbeddedDerby.url("spec_genlane_db")
    spark.sql(s"GRAFT ATTACH JDBC '$derbyUrl' AS genfed").collect()
    val q = spark.sql(
      "SELECT n_regionkey, COUNT(*) AS n FROM genfed.APP.NAT_GEN " +
        "GROUP BY n_regionkey ORDER BY n_regionkey")
    assert(q.queryExecution.executedPlan.toString
      .contains("PushedAggregates:"))
    assert(q.collect().map(_.getLong(1)).sum == 25L)
  }

  test("an unknown vendor url fails loudly with the known profiles") {
    val e = intercept[Exception] {
      spark.sql("GRAFT ATTACH JDBC 'jdbc:nosuch:mem' AS nofed").collect()
    }
    assert(e.getMessage.contains("no engine profile"))
    assert(e.getMessage.contains("duckdb") && e.getMessage.contains("h2"))
  }

  test("profile registry folds identifiers per engine") {
    import graft.spi.ProviderRegistry
    val derby = ProviderRegistry.jdbcEngines("derby")
    val duck = ProviderRegistry.jdbcEngines("duckdb")
    assert(derby.tableIdent("nation") == "NATION")
    assert(duck.tableIdent("nation") == "nation")
    assert(ProviderRegistry.jdbcEngineForUrl("jdbc:h2:mem:x")
      .exists(_.name == "h2"))
  }
}
