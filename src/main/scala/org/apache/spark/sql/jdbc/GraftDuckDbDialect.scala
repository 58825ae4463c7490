package org.apache.spark.sql.jdbc

/** DuckDB dialect for the generic `GRAFT ATTACH JDBC` lane — Spark
  * ships no DuckDB dialect, so without this the default JdbcDialect
  * handles the url with every pushdown capability off. DuckDB speaks
  * near-ANSI SQL (LIMIT/OFFSET, derived-table joins, standard
  * aggregates), so the full DSv2 pushdown surface — aggregates,
  * limit, TopN, offset, same-source joins — is safe to enable; the
  * federated spec proves plans AND results against a live DuckDB
  * database.
  *
  * Lives in org.apache.spark.sql.jdbc for symmetry with
  * [[GraftDerbyJoinDialect]]; only `register()` (plain public Spark
  * API: JdbcDialects.registerDialect) is exposed.
  */
private[jdbc] class GraftDuckDbDialect extends JdbcDialect
    with NoLegacyJDBCError {

  override def canHandle(url: String): Boolean =
    url.toLowerCase(java.util.Locale.ROOT).startsWith("jdbc:duckdb:")

  override def supportsJoin: Boolean = true
  override def supportsLimit: Boolean = true
  override def supportsOffset: Boolean = true

  /** Functions Spark may compile into pushed-down SQL. The default
    * dialect vouches for NONE (so aggregate pushdown silently turns
    * off); DuckDB executes the whole common set. */
  private val supported: Set[String] = Set(
    // aggregates
    "COUNT", "SUM", "AVG", "MIN", "MAX",
    "VAR_POP", "VAR_SAMP", "STDDEV_POP", "STDDEV_SAMP",
    "COVAR_POP", "COVAR_SAMP", "CORR",
    // scalar math / string / conditional
    "ABS", "CEIL", "FLOOR", "ROUND", "SQRT", "POWER", "MOD",
    "EXP", "LN", "LOG10", "GREATEST", "LEAST", "COALESCE",
    "LOWER", "UPPER", "TRIM", "LTRIM", "RTRIM", "SUBSTRING",
    "CONCAT", "LENGTH")

  override def isSupportedFunction(funcName: String): Boolean =
    supported.contains(funcName.toUpperCase(java.util.Locale.ROOT))

  /** DuckDB's JDBC driver raises catalog misses as plain SQLExceptions
    * with no SQLState/vendor code — without this override Spark's
    * tableExists/dropTable probes RETHROW instead of answering
    * "absent" (Spark 4 only swallows exceptions the dialect
    * classifies as object-not-found). */
  override def isObjectNotFoundException(e: java.sql.SQLException)
      : Boolean = {
    def msgs(t: Throwable): Iterator[String] =
      Iterator.iterate[Throwable](t)(_.getCause).takeWhile(_ != null)
        .take(5).flatMap(x => Option(x.getMessage))
    msgs(e).exists(m =>
      m.contains("does not exist") || m.contains("Catalog Error"))
  }
}

object GraftDuckDbDialect {
  /** Register the DuckDB dialect; registered dialects take precedence
    * over built-ins for matching urls. */
  def register(): Unit =
    JdbcDialects.registerDialect(new GraftDuckDbDialect)
}
