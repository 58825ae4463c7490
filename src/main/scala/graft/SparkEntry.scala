package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-area query registries (graft.queries.*) into the
  * flat maps the driver's Verify/Bench harness consumes.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q10_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
    graft.queries.Functions.queries ++
    graft.queries.Extended.queries ++
    graft.queries.Pipeline.queries ++
    graft.queries.Analytics.queries ++
    graft.queries.Interface.queries ++
    graft.queries.Coverage.queries ++
    graft.queries.Advanced.queries ++
    graft.queries.Curation.queries ++
    graft.queries.Behavioral.queries ++
    graft.queries.Quality.queries ++
    graft.queries.Mining.queries ++
    graft.queries.Stats.queries ++
    graft.queries.StreamingOracle.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
    graft.queries.Functions.oracle ++
    graft.queries.Extended.oracle ++
    graft.queries.Pipeline.oracle ++
    graft.queries.Analytics.oracle ++
    graft.queries.Interface.oracle ++
    graft.queries.Coverage.oracle ++
    graft.queries.Advanced.oracle ++
    graft.queries.Curation.oracle ++
    graft.queries.Behavioral.oracle ++
    graft.queries.Quality.oracle ++
    graft.queries.Mining.oracle ++
    graft.queries.Stats.oracle ++
    graft.queries.StreamingOracle.oracle
}
