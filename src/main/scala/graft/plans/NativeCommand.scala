package graft.plans

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StringType

/** GRAFT NATIVE <catalog> '<stmt>' — raw vendor pass-through to an
  * attached RDBMS (reference: sclera's native-statement escape hatch
  * over dbms/rdbms locations), as a RUNTIME command node.
  *
  * It must be a command, not a parse-time side effect: `GRAFT
  * EXPLAIN` (and any analysis-only path) parses the statement, and a
  * parse-time executor would run remote DDL/DML just to print a
  * plan. As a LeafRunnableCommand the statement runs only when the
  * plan is executed, and EXPLAIN (which skips command execution —
  * GraftBridge.explainString) merely renders the node.
  *
  * Result-set statements are flagged, not silently discarded: a
  * SELECT passed through reports status `returned_result_set` with
  * the row count — GRAFT NATIVE is a DDL/DML lane; queries belong to
  * the federated table surface where pushdown applies.
  */
case class NativeStatementCommand(catalog: String, stmt: String)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("catalog", StringType, nullable = false)(),
    AttributeReference("status", StringType, nullable = false)(),
    AttributeReference("update_count", StringType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val url = spark.conf
      .getOption(s"spark.sql.catalog.$catalog.url")
      .getOrElse(throw new IllegalArgumentException(
        s"GRAFT NATIVE: '$catalog' is not an attached catalog"))
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try {
        if (st.execute(stmt)) {
          val rs = st.getResultSet
          var n = 0L
          while (rs.next()) n += 1
          rs.close()
          Seq(Row(catalog, "returned_result_set", n.toString))
        } else
          Seq(Row(catalog, "executed", st.getUpdateCount.toString))
      } finally st.close()
    } finally conn.close()
  }
}
