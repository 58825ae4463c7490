package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SeqMatchOp

/** SQL interface + full regex MATCH surface.
  *
  * The reference is a SQL processor (sql/parser/SqlQueryParser.scala);
  * here the same role is played by spark.sql over registered views —
  * q61 runs ONE dialect-neutral SQL string through both Spark and the
  * DuckDB oracle, exercising parser-level compatibility directly.
  */
object Interface {

  /** Dialect-neutral SQL executed verbatim by Spark and DuckDB. */
  val sqlInterfaceQuery: String =
    """SELECT n_name,
      |  COUNT(*) AS n_orders,
      |  SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS total,
      |  MAX(o_orderdate) AS latest
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |HAVING COUNT(*) >= 20
      |ORDER BY n_name""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q61_sql_interface" -> { (spark, dir) =>
      Tables(spark, dir).registerAll()
      spark.sql(sqlInterfaceQuery)
    },

    // Full regex row-sequence MATCH (Thompson NFA over per-user ordered
    // event labels): click (view)* purchase — reference analytics/
    // sequence/matcher semantics, leftmost-shortest non-overlapping.
    "q62_seq_match_regex" -> { (spark, dir) =>
      val t = Tables(spark, dir)
      SeqMatchOp.matchPattern(
        t.events, "user_id", "ts", "event_type", "click view* purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_matches"),
          max(col("n_rows")).as("longest_match"),
          min(col("first_ord")).as("first_start"))
        .orderBy(col("user_id"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q61_sql_interface" -> sqlInterfaceQuery
  )
}
