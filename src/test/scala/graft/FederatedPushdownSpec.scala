package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Whole-subplan pushdown into the attached Derby database
  * (sources/FederatedPushdown; reference sql/mapper/SqlMapper.scala —
  * sclera executes pushable subtrees inside the attached RDBMS).
  * These are PLAN guards on the oracle-gated q357/q358/q359: the
  * point is not just right answers but that the aggregate / join /
  * top-k actually ran remotely — the remote tables must never be
  * fully fetched into Spark. */
class FederatedPushdownSpec extends AnyFunSuite {
  import TestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("GROUP BY + COUNT/SUM execute inside Derby (PushedAggregates)") {
    val p = plan("q357_fed_agg_pushdown")
    assert(p.contains("PushedAggregates:"), s"aggregate not pushed:\n$p")
    assert(p.contains("PushedGroupByExpressions:"),
      s"group-by not pushed:\n$p")
    assert(p.contains("COUNT"), s"COUNT not in pushed aggregates:\n$p")
    assert(p.contains("SUM"), s"SUM not in pushed aggregates:\n$p")
  }

  test("same-source join collapses into ONE remote query (PushedJoins)") {
    val p = plan("q358_fed_join_pushdown")
    assert(p.contains("PushedJoins:"), s"join not pushed:\n$p")
    // the aggregate COMPOSES with the pushed join: the single remote
    // query runs join + GROUP BY + COUNT/MIN/MAX inside Derby, Spark
    // receives |nations| aggregated rows
    assert(p.contains("PushedAggregates:") &&
      p.contains("PushedGroupByExpressions:"),
      s"aggregate did not compose over the pushed join:\n$p")
    // exactly one JDBC scan — two scans would mean both tables were
    // fetched and joined Spark-side
    val scans = "Scan JDBC".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 remote scan, saw $scans:\n$p")
    for (j <- Seq("SortMergeJoin", "BroadcastHashJoin",
        "ShuffledHashJoin", "BroadcastNestedLoopJoin"))
      assert(!p.contains(j), s"local $j in a pushed-join plan:\n$p")
  }

  test("ORDER BY + LIMIT execute inside Derby (PushedTopN), with the cap") {
    val df = SparkEntry.queries("q359_fed_topn_pushdown")(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedTopN:"), s"top-k not pushed:\n$p")
    // regression guard for the silent-cap-loss bug: Derby has no
    // LIMIT spelling, and without GraftDerbyJoinDialect.getLimitClause
    // the pushed query returned EVERY row while Spark had already
    // dropped the local limit
    assert(df.count() == 5L, "pushed TopN lost its row cap")
  }

  test("pushed results == local parquet computation, row for row") {
    val t = Tables(spark, sfDir)
    val fed = SparkEntry.queries("q358_fed_join_pushdown")(spark, sfDir)
      .collect().toSeq
    val local = t.supplier
      .withColumn("s_acctbal", col("s_acctbal").cast("decimal(12,2)"))
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_supp"),
        min(col("s_acctbal")).cast("double").as("min_bal"),
        max(col("s_acctbal")).cast("double").as("max_bal"))
      .orderBy(col("n_name")).collect().toSeq
    assert(fed == local)
  }

  test("GRAFT ATTACH DERBY statement attaches a pushdown catalog") {
    val t = Tables(spark, sfDir)
    graft.sources.FederatedPushdown.seedOnce(spark, "spec_attach_db",
      "NAT_SPEC", t.nation)
    val status = spark
      .sql("GRAFT ATTACH DERBY 'spec_attach_db' AS specfed")
      .collect().head
    assert(status.getAs[String]("catalog") == "specfed")
    assert(status.getAs[String]("status") == "attached")
    // catalog-qualified reads work and aggregate pushdown is live
    val q = spark.sql(
      "SELECT n_regionkey, COUNT(*) AS n FROM specfed.APP.NAT_SPEC " +
        "GROUP BY n_regionkey ORDER BY n_regionkey")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregates:"), s"no pushdown via SQL:\n$p")
    assert(q.collect().map(_.getLong(1)).sum == 25L)
  }

  test("GRAFT NATIVE passes raw statements through to the attached DB") {
    val t = Tables(spark, sfDir)
    graft.sources.FederatedPushdown.seedOnce(spark, "spec_native_db",
      "NAT_NATIVE", t.nation)
    spark.sql("GRAFT ATTACH DERBY 'spec_native_db' AS natfed")
    // vendor DDL no translated surface covers: CREATE INDEX in Derby
    spark.sql("""GRAFT NATIVE natfed
      'CREATE INDEX NAT_RK_IDX ON "NAT_NATIVE" ("n_regionkey")'""")
      .collect()
    val url = graft.sources.EmbeddedDerby.url("spec_native_db")
    val conn = java.sql.DriverManager.getConnection(url)
    val found =
      try {
        val rs = conn.getMetaData.getIndexInfo(
          null, "APP", "NAT_NATIVE", false, false)
        var names = List.empty[String]
        while (rs.next()) names ::= Option(rs.getString("INDEX_NAME"))
          .getOrElse("")
        rs.close()
        names.contains("NAT_RK_IDX")
      } finally conn.close()
    assert(found, "native CREATE INDEX did not land in Derby")
    // a native UPDATE reports its remote row count
    val st = spark.sql("""GRAFT NATIVE natfed
      'UPDATE "NAT_NATIVE" SET "n_name" = "n_name" WHERE "n_regionkey" = 0'""")
      .collect().head
    assert(st.getAs[String]("status") == "executed")
    assert(st.getAs[String]("update_count") == "5")
    // unknown catalog fails loudly
    assertThrows[Exception] {
      spark.sql("GRAFT NATIVE nosuchcat 'VALUES 1'").collect()
    }
  }

  test("write-back lands IN Derby and re-running is idempotent") {
    // run the registered query twice: DROP IF EXISTS + CTAS + INSERT
    // must converge, not error or accumulate
    val r1 = SparkEntry.queries("q369_fed_writeback")(spark, sfDir)
      .collect().toSeq
    val r2 = SparkEntry.queries("q369_fed_writeback")(spark, sfDir)
      .collect().toSeq
    assert(r1 == r2)
    assert(r1.map(_.getAs[Number](0).longValue).contains(999L),
      "sentinel INSERT lost")
    // the table physically lives in Derby: read it back over RAW jdbc
    // (no Spark catalog in the loop)
    val fp = graft.operators.TextSearchOps.corpusFingerprint(
      s"$sfDir/supplier.parquet")
    val url = graft.sources.EmbeddedDerby.url(s"fedpd_$fp")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT COUNT(*), SUM("n_supp") FROM APP."NATION_BAL_WB"""")
      assert(rs.next())
      assert(rs.getLong(1) == r1.size.toLong)
      assert(rs.getLong(2) ==
        Tables(spark, sfDir).supplier.count(), "summary rows wrong")
    } finally conn.close()
  }
}
