package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** View / added-table admin statements (reference SqlCudParser VIEW
  * createView, SqlAdminParser addTable/removeTable/listOption):
  * lifecycle, graft-dialect composability of the view definition,
  * and the load-bearing pushdown property — a table registered via
  * GRAFT ADD TABLE keeps its DSv2 pushdown lane because the temp
  * view wraps the catalog relation itself. */
class ViewAdminSpec extends AnyFunSuite {
  import TestSession._

  test("CREATE/LIST/DESCRIBE/DROP VIEW lifecycle") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW va_probe AS SELECT 41 AS x")
      .collect()
    spark.sql("GRAFT CREATE VIEW va_probe2 AS SELECT 42 AS x")
      .collect()
    val listed = spark.sql("GRAFT LIST VIEWS")
      .where(col("view").startsWith("va_probe")).collect()
      .map(r => (r.getString(0), r.getBoolean(1))).sorted.toSeq
    assert(listed == Seq(("va_probe", true), ("va_probe2", false)))
    val desc = spark.sql("GRAFT DESCRIBE VIEWS")
      .where(col("view") === "va_probe").collect()
    assert(desc.head.getAs[String]("definition") == "SELECT 41 AS x")
    assert(spark.sql("SELECT x FROM va_probe2").collect()
      .head.getInt(0) == 42)
    val dropped = spark.sql("GRAFT DROP VIEW va_probe").collect()
    assert(dropped.head.getAs[String]("status") == "dropped")
    assert(spark.sql("GRAFT LIST VIEWS")
      .where(col("view") === "va_probe").count() == 0)
    // dropping an unknown view reports absent, not an error
    assert(spark.sql("GRAFT DROP VIEW va_nonexistent").collect()
      .head.getAs[String]("status") == "absent")
    spark.sql("GRAFT DROP VIEW va_probe2").collect()
  }

  test("view definitions compose over the graft dialect") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TEMP VIEW va_top AS " +
      "GRAFT TOPK orders KEY o_orderpriority SCORE o_totalprice " +
      "ID o_orderkey K 2").collect()
    val n = spark.sql(
      "SELECT COUNT(*) AS n FROM va_top").collect().head.getLong(0)
    val groups = Tables(spark, sfDir).orders
      .select(col("o_orderpriority")).distinct().count()
    assert(n == 2 * groups)
    spark.sql("GRAFT DROP VIEW va_top").collect()
  }

  test("CREATE TABLE AS materializes; DROP TABLE removes everything") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE TABLE va_ctas AS " +
      "SELECT n_regionkey, COUNT(*) AS n FROM nation " +
      "GROUP BY n_regionkey").collect()
    val viaTable = spark.sql("SELECT SUM(n) FROM va_ctas")
      .head().getLong(0)
    assert(viaTable == Tables(spark, sfDir).nation.count())
    // the same name reads as an external location too
    assert(spark.sql("SELECT COUNT(*) FROM EXTERNAL(va_ctas)")
      .head().getLong(0) == 5)
    // MATERIALIZED: the stored rows are a parquet snapshot, not the
    // defining plan — the scan must read files, not recompute
    val plan = spark.table("va_ctas").queryExecution
      .executedPlan.toString
    assert(plan.contains("Scan parquet") &&
      !plan.contains("HashAggregate"), s"CTAS not materialized:\n$plan")
    // appears in the unified object listing through its location
    assert(spark.sql("GRAFT LIST OBJECTS va_ctas").count() == 1)
    val dropped = spark.sql("GRAFT DROP TABLE va_ctas").collect()
    assert(dropped.head.getAs[String]("status") == "dropped")
    assert(!spark.catalog.tableExists("va_ctas"))
    assert(graft.sources.ExternalLocations.get("va_ctas").isEmpty)
    // TEMP variant: session-cached, no location registered
    spark.sql("GRAFT CREATE TEMP TABLE va_ctas_t AS " +
      "SELECT 7 AS x").collect()
    assert(spark.sql("SELECT x FROM va_ctas_t").head().getInt(0) == 7)
    assert(graft.sources.ExternalLocations.get("va_ctas_t").isEmpty)
    spark.sql("GRAFT DROP TABLE va_ctas_t").collect()
  }

  test("ADD TABLE keeps the pushdown lane; REMAINING diffs; REMOVE") {
    val t = Tables(spark, sfDir)
    val db = "viewadm_spec"
    graft.sources.FederatedPushdown.seedOnce(spark, db,
      "VA_NATION", t.nation)
    graft.sources.FederatedPushdown.seedOnce(spark, db,
      "VA_REGION", t.region)
    spark.sql(s"GRAFT ATTACH DERBY '$db' AS vacat").collect()
    spark.sql("GRAFT ADD TABLE vacat.VA_NATION AS va_nation").collect()

    // the aggregate over the added table pushes into Derby
    val agg = spark.sql(
      "SELECT n_regionkey, COUNT(*) AS n FROM va_nation " +
        "GROUP BY n_regionkey")
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("PushedAggregates:"),
      s"aggregate not pushed through the added table:\n$p")
    assert(agg.collect().map(_.getLong(1)).sum == t.nation.count())

    val listed = spark.sql("GRAFT LIST TABLES")
      .where(col("table") === "va_nation").collect()
    assert(listed.length == 1 &&
      listed.head.getAs[String]("catalog") == "vacat")

    val remaining = spark.sql("GRAFT LIST REMAINING vacat")
      .select(lower(col("remaining"))).collect().map(_.getString(0))
      .filter(_.startsWith("va_")).toSeq
    assert(remaining == Seq("va_region"))

    assert(spark.sql("GRAFT REMOVE TABLE va_nation").collect()
      .head.getAs[String]("status") == "removed")
    assert(spark.sql("GRAFT LIST TABLES")
      .where(col("table") === "va_nation").count() == 0)
  }

  test("DROP TABLE clears an ADD TABLE registration (no phantom row)") {
    val t = Tables(spark, sfDir)
    val db = "viewadm_spec2"
    graft.sources.FederatedPushdown.seedOnce(spark, db,
      "VA_NATION2", t.nation)
    spark.sql(s"GRAFT ATTACH DERBY '$db' AS vacat2").collect()
    spark.sql("GRAFT ADD TABLE vacat2.VA_NATION2 AS va_nat2").collect()
    assert(spark.sql("GRAFT DROP TABLE va_nat2").collect()
      .head.getAs[String]("status") == "dropped")
    // the registry entry goes with the temp view: LIST TABLES must
    // not keep a phantom row whose reads fail
    assert(spark.sql("GRAFT LIST TABLES")
      .where(col("table") === "va_nat2").count() == 0)
    assert(!spark.catalog.tableExists("va_nat2"))
  }

  test("DROP TABLE/VIEW reject kind mismatches instead of half-dropping") {
    Tables(spark, sfDir).registerAll()
    spark.sql("GRAFT CREATE VIEW va_kind_v AS SELECT 1 AS x").collect()
    spark.sql("GRAFT CREATE TABLE va_kind_t AS " +
      "SELECT r_regionkey FROM region").collect()
    // DROP TABLE on a view: refused, view intact
    assert(spark.sql("GRAFT DROP TABLE va_kind_v").collect()
      .head.getAs[String]("status") == "not_a_table")
    assert(spark.sql("SELECT x FROM va_kind_v").head().getInt(0) == 1)
    // DROP VIEW on a CTAS table: refused, table intact
    assert(spark.sql("GRAFT DROP VIEW va_kind_t").collect()
      .head.getAs[String]("status") == "not_a_view")
    assert(spark.sql("SELECT COUNT(*) FROM va_kind_t")
      .head().getLong(0) == 5)
    spark.sql("GRAFT DROP VIEW va_kind_v").collect()
    spark.sql("GRAFT DROP TABLE va_kind_t").collect()
  }
}
