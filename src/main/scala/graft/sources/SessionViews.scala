package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

import java.util.WeakHashMap

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

  // weakly keyed per session (the ModelCache discipline): a closed
  // session's registry entries must not pin the SparkSession
  private val views =
    new WeakHashMap[SparkSession, TrieMap[String, ViewDef]]()
  private val tables =
    new WeakHashMap[SparkSession, TrieMap[String, AddedTable]]()

  private def map[A](store: WeakHashMap[SparkSession, TrieMap[String, A]],
      spark: SparkSession): TrieMap[String, A] = store.synchronized {
    var m = store.get(spark)
    if (m == null) {
      m = TrieMap.empty[String, A]
      store.put(spark, m)
    }
    m
  }

  def putView(spark: SparkSession, v: ViewDef): Unit =
    map(views, spark).put(v.name.toLowerCase, v)

  def dropView(spark: SparkSession, name: String): Boolean =
    map(views, spark).remove(name.toLowerCase).isDefined

  def listViews(spark: SparkSession): Seq[ViewDef] =
    map(views, spark).values.toSeq.sortBy(_.name)

  def putTable(spark: SparkSession, t: AddedTable): Unit =
    map(tables, spark).put(t.name.toLowerCase, t)

  def dropTable(spark: SparkSession, name: String): Boolean =
    map(tables, spark).remove(name.toLowerCase).isDefined

  def listTables(spark: SparkSession): Seq[AddedTable] =
    map(tables, spark).values.toSeq.sortBy(_.name)
}
