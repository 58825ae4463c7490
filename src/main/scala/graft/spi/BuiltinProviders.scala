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
  import BuiltinProviders.{datePartStrCase, randomStrBody}

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
    // reference RANDOMSTR(n) (ScalFunctionEvaluator.scala:515). The
    // 2-arg primary form is graft's DETERMINISTIC variant (keyed by
    // (__arg0, position) through the portable graft_fingerprint, so
    // the DuckDB oracle rebuilds every string bit-for-bit — q451).
    // The 1-arg overload is the reference's ACTUAL signature:
    // RANDOMSTR(n) draws a fresh random string per evaluation, so it
    // keys by rand() — drop-in for migrated reference SQL, but (like
    // the reference) not oracle-replicable.
    FunctionProvider("randomstr", 2,
      randomStrBody("__arg1",
        "graft_fingerprint(concat(cast(__arg0 as string), " +
          "'|', cast(graft_i as string)))"),
      "deterministic alphanumeric string of __arg1 chars keyed by " +
        "__arg0; 1-arg form randomstr(n) is rand()-keyed " +
        "(reference signature)",
      altTemplates = Map(1 -> randomStrBody("__arg0",
        "cast(floor(rand() * 9007199254740992.0) as bigint)"))),
    // reference DATE_PARTSTR(style, part, date)
    // (ScalFunctionEvaluator.scala:857): DISPLAY NAME of a date part —
    // SHORT/LONG month and weekday names, SHORT 'Q1' / LONG 'QUARTER1'
    // quarters (plus graft's legacy 'Q' style = SHORT, pinned by
    // q452's oracle), numeric string fallback for un-named fields.
    // The 2-arg overload is the reference's default-SHORT form.
    FunctionProvider("date_partstr", 3,
      datePartStrCase("upper(__arg0)", "__arg1", "__arg2"),
      "display name of a date part (SHORT/LONG styles; 2-arg form " +
        "defaults to SHORT)",
      altTemplates =
        Map(2 -> datePartStrCase("'SHORT'", "__arg0", "__arg1"))))

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

object BuiltinProviders {

  /** randomstr template body: alphanumeric string of `lenArg` chars,
    * each char indexed by `keySql` (which may reference the per-char
    * position `graft_i`). The n <= 0 guard is explicit: Spark's
    * sequence(0, -1) DESCENDS instead of yielding an empty array. */
  private def randomStrBody(lenArg: String, keySql: String): String =
    s"CASE WHEN cast($lenArg as int) <= 0 THEN '' ELSE " +
      s"array_join(transform(sequence(0, cast($lenArg as int) - 1), " +
      "graft_i -> substr('ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "abcdefghijklmnopqrstuvwxyz0123456789', " +
      s"cast(pmod($keySql, 62) as int) + 1, 1)), '') END"

  /** DATE_PARTSTR dispatch CASE over a style expression and the
    * part/date argument slots (shared by the 3-arg and the 2-arg
    * default-SHORT forms). Quarter styles follow the reference
    * (ScalFunctionEvaluator.scala:857): SHORT 'Q1', LONG 'QUARTER1';
    * graft's original 'Q' style stays as a SHORT alias. WEEK_OF_MONTH
    * is day-arithmetic (Spark 3+ rejects the 'W' datetime pattern);
    * MILLISECOND goes through the 'SSS' fraction pattern. */
  private def datePartStrCase(
      style: String, part: String, date: String): String = {
    val p = s"upper($part)"
    "CASE " +
      s"WHEN $p = 'MONTH' AND $style = 'SHORT' " +
      s"THEN date_format($date, 'MMM') " +
      s"WHEN $p = 'MONTH' AND $style = 'LONG' " +
      s"THEN date_format($date, 'MMMM') " +
      s"WHEN $p = 'DAY_OF_WEEK' AND $style = 'SHORT' " +
      s"THEN date_format($date, 'EEE') " +
      s"WHEN $p = 'DAY_OF_WEEK' AND $style = 'LONG' " +
      s"THEN date_format($date, 'EEEE') " +
      s"WHEN $p = 'QUARTER' AND $style IN ('SHORT', 'Q') " +
      s"THEN concat('Q', cast(quarter($date) as string)) " +
      s"WHEN $p = 'QUARTER' AND $style = 'LONG' " +
      s"THEN concat('QUARTER', cast(quarter($date) as string)) " +
      s"WHEN $p = 'QUARTER' " +
      s"THEN cast(quarter($date) as string) " +
      s"WHEN $p = 'WEEK_OF_MONTH' " +
      s"THEN cast(cast(floor((day($date) - 1) / 7) + 1 as int) " +
      "as string) " +
      s"WHEN $p = 'DAY_OF_MONTH' " +
      s"THEN cast(day($date) as string) " +
      s"WHEN $p = 'DAY_OF_YEAR' " +
      s"THEN cast(dayofyear($date) as string) " +
      s"WHEN $p = 'YEAR' " +
      s"THEN cast(year($date) as string) " +
      s"WHEN $p = 'HOUR' " +
      s"THEN cast(hour($date) as string) " +
      s"WHEN $p = 'MINUTE' " +
      s"THEN cast(minute($date) as string) " +
      s"WHEN $p = 'SECOND' " +
      s"THEN cast(second($date) as string) " +
      s"WHEN $p = 'MILLISECOND' " +
      s"THEN cast(cast(date_format($date, 'SSS') as int) as string) " +
      "ELSE NULL END"
  }
}
