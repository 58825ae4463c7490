package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events: DataFrame = table("events")
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")

  /** Register all tables as temp views for spark.sql(...) queries. */
  def registerAll(): Unit =
    Tables.names.foreach { n => table(n).createOrReplaceTempView(n) }
}

object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
