package graft.sources

import java.sql.DriverManager

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-subplan pushdown into an attached RDBMS — sclera's deepest
  * data-virtualization capability (reference: sql/mapper/
  * SqlMapper.scala:23 + sql/mapper/TargetSqlQuery.scala translate
  * pushable subtrees into target-dialect SQL executed inside the
  * attached DB via dbms/driver/StatementDriver.scala:31).
  *
  * Spark-first re-expression: instead of a hand-rolled SQL mapper,
  * the attached database is registered as a DataSource V2
  * JDBCTableCatalog with every pushdown capability enabled, and
  * Catalyst's own V2ScanRelationPushDown performs the subtree
  * translation — filters, projections, AGGREGATES (partial or
  * complete, PushedAggregates/PushedGroupByExpressions in the scan),
  * ORDER BY + LIMIT (PushedTopN), OFFSET, and same-source JOINs
  * (SupportsPushDownJoin: two scans of the attached catalog collapse
  * into ONE remote query joining inside the RDBMS — the remote
  * tables are never fully fetched).
  *
  * Derby ships no join-pushdown support in its stock dialect
  * (JdbcDialect.supportsJoin defaults false); [[GraftDerbyDialect]]
  * turns it on — the generated join SQL is ANSI derived-table joins,
  * which Derby executes fine (FederatedPushdownSpec proves results
  * AND plans).
  *
  * 100-TB shape: the attached RDBMS holds dimension/metadata-scale
  * relations; pushdown means Spark receives only the joined/
  * aggregated result (model-sized), never the raw remote rows, and
  * the big parquet fact side stays in Spark where it scales.
  */
object FederatedPushdown {

  import graft.spi.{JdbcEngineProfile, ProviderRegistry}

  /** Vendor dialects registered with Spark's JdbcDialects, once per
    * engine per process; registered dialects take precedence over
    * built-ins for matching urls. */
  private val dialectRegistered = TrieMap.empty[String, Unit]

  /** Engine profile of each attached catalog, so [[table]] can
    * qualify names with the vendor's default schema and identifier
    * case without the caller caring which engine is behind it. */
  private val attachedProfiles = TrieMap.empty[String, JdbcEngineProfile]

  /** Attach ANY JDBC database as DSv2 catalog `catalog` — the
    * generic federation lane (`GRAFT ATTACH JDBC '<url>' AS <cat>`).
    * The engine profile (dialect, driver, default schema, which
    * pushdown lanes the vendor's SQL genuinely renders) resolves
    * from the ServiceLoader SPI by url prefix, so third-party jars
    * add vendors the same way they add functions and source kinds —
    * the reference's rdbms-location SPI re-expressed over Spark's
    * JDBCTableCatalog + JdbcDialects (pushdown itself is Catalyst's
    * V2ScanRelationPushDown; nothing vendor-specific in our planner).
    * Idempotent. Returns the catalog name. */
  def attachJdbc(spark: SparkSession, catalog: String, url: String,
      driver: Option[String] = None): String = {
    val profile = ProviderRegistry.jdbcEngineForUrl(url).getOrElse(
      throw new IllegalArgumentException(
        s"GRAFT ATTACH JDBC: no engine profile for url '$url' " +
          s"(known: ${ProviderRegistry.jdbcEngines.keys.toSeq.sorted
            .mkString(", ")}); third-party profiles register through " +
          "the graft.spi.GraftJdbcDialectProviderService SPI"))
    dialectRegistered.getOrElseUpdate(profile.name, {
      profile.dialect.foreach(d =>
        org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(d()))
    })
    spark.conf.set(s"spark.sql.catalog.$catalog",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    spark.conf.set(s"spark.sql.catalog.$catalog.url", url)
    driver.orElse(profile.driverClass).foreach(d =>
      spark.conf.set(s"spark.sql.catalog.$catalog.driver", d))
    // Only the pushdown lanes the profile vouches for: the pushdown
    // paths do not reliably consult the dialect's supports* flags
    // (observed with Derby TopN: the pushed query silently lost its
    // row cap), so enabling a lane the dialect cannot spell is a
    // CORRECTNESS bug, not just a missed optimization.
    for (k <- profile.pushdownConfs)
      spark.conf.set(s"spark.sql.catalog.$catalog.$k", "true")
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    attachedProfiles.put(catalog, profile)
    catalog
  }

  /** Attach the embedded-Derby database `dbName` — sugar over
    * [[attachJdbc]] (`GRAFT ATTACH DERBY '<db>' AS <cat>`). */
  def attach(spark: SparkSession, catalog: String, dbName: String)
      : String =
    attachJdbc(spark, catalog, EmbeddedDerby.url(dbName))

  /** A table of an attached catalog, qualified with the engine's
    * default schema and identifier case (Derby/H2: APP/PUBLIC,
    * upper-cased; DuckDB: main, case kept). */
  def table(spark: SparkSession, catalog: String, name: String)
      : DataFrame = {
    val p = attachedProfiles.getOrElse(catalog,
      throw new IllegalArgumentException(
        s"'$catalog' is not an attached catalog"))
    spark.table(s"$catalog.${p.defaultSchema}.${p.tableIdent(name)}")
  }

  /** All table names in the attached catalog's default schema (the
    * discovery list GRAFT LIST REMAINING diffs against the added
    * set) — via the DSv2 catalog's own listing, so it works for any
    * engine profile. */
  def remoteTables(spark: SparkSession, catalog: String): Seq[String] = {
    val p = attachedProfiles.getOrElse(catalog,
      throw new IllegalArgumentException(
        s"'$catalog' is not an attached catalog"))
    spark.sql(s"SHOW TABLES IN $catalog.${p.defaultSchema}")
      .collect().map(_.getAs[String]("tableName")).toSeq.sorted
  }

  private val seeded = TrieMap.empty[(String, String), Unit]

  /** Seed `df` into Derby table `table` of `dbName` exactly once per
    * content: the caller passes a content-fingerprinted dbName (as
    * q231 does), so existence of the table proves it holds this data
    * — re-seeding would only rewrite identical rows. Process-local
    * fast path plus a catalog-metadata existence check for dbs left
    * by earlier processes. */
  def seedOnce(spark: SparkSession, dbName: String, table: String,
      df: => DataFrame): Unit = {
    val key = (dbName, table)
    if (seeded.contains(key)) return
    seeded.synchronized {
      if (seeded.contains(key)) return
      val url = EmbeddedDerby.url(dbName)
      val conn = DriverManager.getConnection(url)
      val exists =
        try {
          val rs = conn.getMetaData
            .getTables(null, "APP", table.toUpperCase, null)
          try rs.next() finally rs.close()
        } finally conn.close()
      if (!exists) {
        val d = df
        // Spark's JDBC writer maps StringType to Derby CLOB, which
        // Derby refuses in ORDER BY / GROUP BY / join comparisons —
        // exactly the clauses pushdown generates. Seed strings as
        // VARCHAR instead.
        val varchars = d.schema.fields.collect {
          case f if f.dataType == org.apache.spark.sql.types.StringType =>
            s"${f.name} VARCHAR(255)"
        }.mkString(", ")
        val opts = Map(
          "driver" -> "org.apache.derby.jdbc.EmbeddedDriver") ++
          (if (varchars.nonEmpty)
            Map("createTableColumnTypes" -> varchars) else Map.empty)
        JdbcLocation(url, table, opts).write(d)
      }
      seeded.put(key, ())
      ()
    }
  }
}
