package org.apache.spark.sql.jdbc

import java.sql.Types

import org.apache.spark.sql.types.{DataType, StringType}

/** Derby's stock dialect with DataSource V2 JOIN PUSHDOWN enabled
  * (JdbcDialect.supportsJoin defaults to false and DerbyDialect does
  * not override it; the generated join SQL is ANSI derived-table
  * joins, which Derby executes fine — proven end-to-end by
  * graft's FederatedPushdownSpec).
  *
  * Lives in the org.apache.spark.sql.jdbc package because
  * DerbyDialect is package-private at the Scala level; the class
  * stays package-private too and only the `register()` entry point
  * (plain public Spark API: JdbcDialects.registerDialect) is exposed.
  */
private[jdbc] class GraftDerbyJoinDialect extends DerbyDialect {
  override def supportsJoin: Boolean = true

  /** Derby has no LIMIT clause; its ANSI row cap is FETCH FIRST. The
    * stock dialect leaves supportsLimit=false BUT getLimitClause
    * returning "" is still consulted by the TopN pushdown path, which
    * silently drops the row cap (wrong results: the remote query
    * returns everything and Spark has already removed the local
    * limit). Emitting the real clause makes limit/TopN pushdown both
    * available and correct. */
  override def supportsLimit: Boolean = true

  override def getLimitClause(limit: Integer): String =
    if (limit > 0) s"FETCH FIRST $limit ROWS ONLY" else ""

  /** The stock mapping sends StringType to CLOB, which Derby refuses
    * in ORDER BY / GROUP BY / join comparisons — exactly the clauses
    * pushdown generates against tables graft WRITES BACK via catalog
    * DDL (CTAS / INSERT, where no per-write createTableColumnTypes
    * hook exists). VARCHAR(255) keeps written-back dimension tables
    * queryable; oversize strings fail loudly at write time rather
    * than silently degrading pushdown. */
  override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
    case StringType => Some(JdbcType("VARCHAR(255)", Types.VARCHAR))
    case _ => super.getJDBCType(dt)
  }
}

object GraftDerbyJoinDialect {
  /** Register the join-capable Derby dialect; registered dialects
    * take precedence over built-ins for matching urls. Idempotent in
    * effect (re-registration just shadows with an equal dialect). */
  def register(): Unit =
    JdbcDialects.registerDialect(new GraftDerbyJoinDialect)
}
