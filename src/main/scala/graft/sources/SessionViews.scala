package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Session-scoped registries for the view / added-table admin
  * statements (reference: sql/statements — SqlCreateDbObject for
  * views, SqlAddTable / SqlRemoveTable / SqlListAddedTables /
  * SqlListRemainingTables for per-location table registration;
  * sql/parser/SqlAdminParser.scala:62-113).
  *
  * Views and added tables are session objects like named models: the
  * temp-view registration carries the actual plan (so an added JDBC
  * table keeps its DSv2 pushdown lane), and this registry carries the
  * metadata the LIST/DESCRIBE statements render. Keyed by session so
  * concurrent sessions (JDBC driver, HTTP service) don't see each
  * other's objects.
  */
object SessionViews {

  /** A view created by GRAFT CREATE [TEMP] VIEW. `definition` is the
    * original statement text (any graft-dialect statement). */
  final case class ViewDef(name: String, definition: String,
      temp: Boolean)

  /** A remote table registered by GRAFT ADD TABLE under a local
    * name. `remote` is the fully qualified catalog identifier. */
  final case class AddedTable(name: String, catalog: String,
      remote: String)

  private val views = TrieMap.empty[(SparkSession, String), ViewDef]
  private val tables = TrieMap.empty[(SparkSession, String), AddedTable]

  def putView(spark: SparkSession, v: ViewDef): Unit =
    views.put((spark, v.name.toLowerCase), v)

  def dropView(spark: SparkSession, name: String): Boolean =
    views.remove((spark, name.toLowerCase)).isDefined

  def listViews(spark: SparkSession): Seq[ViewDef] =
    views.collect { case ((s, _), v) if s eq spark => v }
      .toSeq.sortBy(_.name)

  def putTable(spark: SparkSession, t: AddedTable): Unit =
    tables.put((spark, t.name.toLowerCase), t)

  def dropTable(spark: SparkSession, name: String): Boolean =
    tables.remove((spark, name.toLowerCase)).isDefined

  def listTables(spark: SparkSession): Seq[AddedTable] =
    tables.collect { case ((s, _), t) if s eq spark => t }
      .toSeq.sortBy(_.name)
}
