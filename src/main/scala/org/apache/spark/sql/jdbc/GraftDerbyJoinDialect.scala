package org.apache.spark.sql.jdbc

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
}

object GraftDerbyJoinDialect {
  /** Register the join-capable Derby dialect; registered dialects
    * take precedence over built-ins for matching urls. Idempotent in
    * effect (re-registration just shadows with an equal dialect). */
  def register(): Unit =
    JdbcDialects.registerDialect(new GraftDerbyJoinDialect)
}
