package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Minimal pg_catalog-style metadata surface (reference: pgcatalog/ —
  * sclera exposes pg_class/pg_namespace views so PG-protocol clients
  * can introspect the schema). Here the same information is derived
  * from the live table schemas as small DataFrames.
  */
object Catalog {

  /** One row per (table, column): relname, attname, attnum, typename. */
  def pgAttribute(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    Tables.names.map { name =>
      val schema = t.table(name).schema
      import spark.implicits._
      schema.fields.zipWithIndex.map { case (f, i) =>
        (name, f.name, i + 1, f.dataType.typeName)
      }.toSeq.toDF("relname", "attname", "attnum", "typname")
    }.reduce(_ unionAll _)
  }

  /** One row per table: relname, relkind, n_atts. */
  def pgClass(spark: SparkSession, dir: String): DataFrame =
    pgAttribute(spark, dir)
      .groupBy(col("relname"))
      .agg(lit("r").as("relkind"), max(col("attnum")).as("n_atts"))
}
