package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Catalog over the driver-generated parquet tables in one sf directory.
  *
  * Mirrors the reference's notion of a schema of base tables
  * (reference: modules/core/src/main/scala/objects — SchemaTable et al.)
  * re-expressed as plain Spark parquet scans so Catalyst gets full
  * pushdown/pruning on every query.
  */
final class Tables(val spark: SparkSession, val dir: String) {
  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    * reader rejects; read it as long nanos and truncate to micros —
    * the same truncation DuckDB applies, keeping oracle parity. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts",
      timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register all tables as temp views for spark.sql(...) queries.
    * Uses the per-table accessors so `events` gets the nanos->micros
    * treatment (a raw table("events") read throws on the
    * TIMESTAMP(NANOS) column in a fresh session). */
  def registerAll(): Unit = {
    val dfs = Map(
      "region" -> region, "nation" -> nation, "customer" -> customer,
      "supplier" -> supplier, "part" -> part, "orders" -> orders,
      "lineitem" -> lineitem, "events" -> events,
      "documents" -> documents, "embeddings" -> embeddings)
    Tables.names.foreach { n => dfs(n).createOrReplaceTempView(n) }
  }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
