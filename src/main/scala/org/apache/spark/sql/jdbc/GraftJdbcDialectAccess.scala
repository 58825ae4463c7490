package org.apache.spark.sql.jdbc

/** Public accessors for graft's package-private vendor dialects, so
  * the SPI layer (graft.spi.BuiltinProviders) can hand them to the
  * generic ATTACH lane without widening the dialect classes
  * themselves beyond org.apache.spark.sql.jdbc. */
object GraftJdbcDialectAccess {
  def derbyJoin: JdbcDialect = new GraftDerbyJoinDialect
  def duckdb: JdbcDialect = new GraftDuckDbDialect
}
