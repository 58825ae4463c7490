package graft.spi

import org.apache.spark.sql.types.StructType

import graft.sources.{CsvLocation, ExternalLocation, JsonLocation,
  ParquetLocation, TextLocation}

/** Graft's built-in providers, registered through the SAME
  * ServiceLoader channel third-party jars would use
  * (META-INF/services entries in src/main/resources) — the discovery
  * path is therefore exercised by every GRAFT ADD LOCATION / ADD
  * FUNCTION statement, not only by the SPI spec. */
final class BuiltinProviders
    extends GraftFunctionProviderService with GraftSourceProviderService
    with GraftJdbcDialectProviderService
    with GraftNlpTaskProviderService {

  /** Deterministic local stand-ins for external-service functions
    * (this container has no egress); a deployment would generate the
    * same templates from the service's pushdown contract. */
  override def functionProviders: Seq[FunctionProvider] = Seq(
    FunctionProvider("tiered_discount", 2,
      "__arg0 * (1.0 - least(__arg1, 10) * 0.01)",
      "price discounted 1% per unit, capped at 10%"),
    FunctionProvider("geo_bucket", 2,
      "cast(floor(__arg0 / 10.0) * 100 + floor(__arg1 / 10.0) as bigint)",
      "10-degree lat/lon grid cell id"),
    FunctionProvider("risk_score", 2,
      "least(100.0, __arg0 * 2.0 + __arg1 * 0.5)",
      "bounded linear risk blend of two signals"),
    // reference RANDOMSTR(n) (ScalFunctionEvaluator.scala:515), made
    // DETERMINISTIC like the rest of graft's random family: the
    // alphanumeric string is keyed by (__arg0, position) through the
    // portable graft_fingerprint, so results replicate across
    // engines/runs/partitionings and the DuckDB oracle rebuilds them
    // bit-for-bit
    FunctionProvider("randomstr", 2,
      // n <= 0 guards the empty string explicitly: Spark's
      // sequence(0, -1) DESCENDS instead of yielding an empty array
      "CASE WHEN cast(__arg1 as int) <= 0 THEN '' ELSE " +
        "array_join(transform(sequence(0, cast(__arg1 as int) - 1), " +
        "graft_i -> substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
        "abcdefghijklmnopqrstuvwxyz0123456789', " +
        "cast(pmod(graft_fingerprint(concat(cast(__arg0 as string), " +
        "'|', cast(graft_i as string))), 62) as int) + 1, 1)), '') END",
      "deterministic alphanumeric string of __arg1 chars keyed by " +
        "__arg0"),
    // reference DATE_PARTSTR(style, part, date)
    // (ScalFunctionEvaluator.scala:857): DISPLAY NAME of a date part
    // — SHORT/LONG month and weekday names, Q-style quarters,
    // numeric string fallback for the un-named fields
    FunctionProvider("date_partstr", 3,
      "CASE " +
        "WHEN upper(__arg1) = 'MONTH' AND upper(__arg0) = 'SHORT' " +
        "THEN date_format(__arg2, 'MMM') " +
        "WHEN upper(__arg1) = 'MONTH' AND upper(__arg0) = 'LONG' " +
        "THEN date_format(__arg2, 'MMMM') " +
        "WHEN upper(__arg1) = 'DAY_OF_WEEK' AND upper(__arg0) = 'SHORT' " +
        "THEN date_format(__arg2, 'EEE') " +
        "WHEN upper(__arg1) = 'DAY_OF_WEEK' AND upper(__arg0) = 'LONG' " +
        "THEN date_format(__arg2, 'EEEE') " +
        "WHEN upper(__arg1) = 'QUARTER' AND upper(__arg0) = 'Q' " +
        "THEN concat('Q', cast(quarter(__arg2) as string)) " +
        "WHEN upper(__arg1) = 'QUARTER' " +
        "THEN cast(quarter(__arg2) as string) " +
        "WHEN upper(__arg1) = 'DAY_OF_MONTH' " +
        "THEN cast(day(__arg2) as string) " +
        "WHEN upper(__arg1) = 'DAY_OF_YEAR' " +
        "THEN cast(dayofyear(__arg2) as string) " +
        "WHEN upper(__arg1) = 'YEAR' " +
        "THEN cast(year(__arg2) as string) " +
        "WHEN upper(__arg1) = 'MINUTE' " +
        "THEN cast(minute(__arg2) as string) " +
        "WHEN upper(__arg1) = 'SECOND' " +
        "THEN cast(second(__arg2) as string) " +
        "ELSE NULL END",
      "display name of a date part (SHORT/LONG/Q styles)"))

  override def sourceKinds
      : Map[String, (String, Option[StructType]) => ExternalLocation] = Map(
    "PARQUET" -> ((path, _) => ParquetLocation(path)),
    "CSV" -> ((path, schema) =>
      CsvLocation(path, header = true, schema)),
    "JSON" -> ((path, schema) => JsonLocation(path, schema)),
    "TEXT" -> ((path, _) => TextLocation(path)))

  /** Built-in NLP tasks, registered through the SAME ServiceLoader
    * channel a third-party tagger jar would use (reference
    * analytics/nlp/service/NlpService.scala — core ships its tasks as
    * services too, so plugins are first-class). Pure Column
    * transforms: codegen'd, prunable, no UDFs. */
  override def nlpTasks: Seq[NlpTask] = {
    import org.apache.spark.sql.functions._
    Seq(
      NlpTask("sentences",
        "sentence segmentation stats: count, avg/max chars",
        text => {
          val sents = filter(split(text, "[.!?]+"), s => length(s) > 0)
          Seq(
            "n_sent" -> size(sents),
            "avg_sent_chars" -> when(size(sents) > 0,
              length(text).cast("double") / size(sents).cast("double"))
              .otherwise(lit(0.0)),
            "max_sent_chars" ->
              coalesce(array_max(transform(sents, s => length(s))),
                lit(0)))
        }),
      NlpTask("tokens",
        "whitespace token stats: total and distinct counts",
        text => {
          val toks = graft.functions.TextFunctions.tokens(text)
          Seq(
            "n_toks" -> size(toks),
            "n_dist" -> size(array_distinct(toks)))
        }))
  }

  /** Built-in JDBC engine profiles for the generic ATTACH lane.
    * Pushdown lanes list only the clauses each dialect genuinely
    * renders (see JdbcEngineProfile): Derby has no OFFSET-after-FETCH
    * or TABLESAMPLE spelling, DuckDB and H2 take the full set. The
    * H2 profile rides Spark's own H2Dialect (join-pushdown capable);
    * only the org.h2.Driver jar must be on the classpath to use it. */
  override def jdbcEngines: Seq[JdbcEngineProfile] = Seq(
    JdbcEngineProfile("derby", "jdbc:derby:",
      Some("org.apache.derby.jdbc.EmbeddedDriver"),
      defaultSchema = "APP", upperCaseIdentifiers = true,
      pushdownConfs =
        Seq("pushDownAggregate", "pushDownLimit", "pushDownJoin"),
      dialect = Some(() =>
        org.apache.spark.sql.jdbc.GraftJdbcDialectAccess.derbyJoin)),
    JdbcEngineProfile("duckdb", "jdbc:duckdb:",
      Some("org.duckdb.DuckDBDriver"),
      defaultSchema = "main", upperCaseIdentifiers = false,
      pushdownConfs = Seq("pushDownAggregate", "pushDownLimit",
        "pushDownOffset", "pushDownJoin"),
      dialect = Some(() =>
        org.apache.spark.sql.jdbc.GraftJdbcDialectAccess.duckdb)),
    JdbcEngineProfile("h2", "jdbc:h2:", Some("org.h2.Driver"),
      defaultSchema = "PUBLIC", upperCaseIdentifiers = true,
      pushdownConfs = Seq("pushDownAggregate", "pushDownLimit",
        "pushDownOffset", "pushDownJoin"),
      dialect = None))
}
